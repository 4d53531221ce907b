"""Flax linear-LA wrappers + launch helpers."""

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.nn import LinearLayerAttention, LinearCLA, LinearGLA, MLALayer
from mrla_tpu.parallel.launch import init_distributed, is_main_process


def test_linear_la_modules_thread_state():
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 4, 4, 8)),
                    jnp.float32)
    for mod, extra in [
        (LinearLayerAttention(), {}),
        (LinearCLA(), {}),
        (LinearGLA(dim_pergroup=4), {}),
    ]:
        v = mod.init(jax.random.key(0), x, None, None)
        out, s, z = mod.apply(v, x, None, None)
        out2, s2, z2 = mod.apply(v, x, s, z)
        assert out.shape == x.shape and out2.shape == x.shape
        assert bool(jnp.isfinite(out2).all())
        # state actually accumulated
        assert not np.allclose(np.asarray(s), np.asarray(s2))


def test_mla_alias():
    x = jnp.ones((1, 4, 4, 8))
    m = MLALayer(dim_perhead=4)
    v = m.init(jax.random.key(0), x)
    assert m.apply(v, x).shape == x.shape


def test_init_distributed_single_process():
    info = init_distributed()
    assert info["process_count"] == 1 and info["process_index"] == 0
    assert is_main_process()
