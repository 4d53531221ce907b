"""Detection serving engine == Flax MRLABackboneFPN (BN-folded parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrla_tpu.detect import MRLABackboneFPN
from mrla_tpu.serving import detect_forward, prepare_detect_params

LAYERS = (1, 1, 1, 1)


def _setup(seed=0, add_extra_convs=None, start_level=0):
    m = MRLABackboneFPN(layers=LAYERS, start_level=start_level,
                        add_extra_convs=add_extra_convs)
    v = m.init(jax.random.key(seed), jnp.zeros((1, 64, 64, 3)), train=False)
    # non-trivial BN stats so folding is actually exercised
    import flax

    flat = flax.traverse_util.flatten_dict(v["batch_stats"])
    rng = np.random.default_rng(8)
    new = {}
    for k, a in flat.items():
        if k[-1] == "var":
            new[k] = jnp.asarray(rng.random(a.shape) + 0.5, jnp.float32)
        else:
            new[k] = jnp.asarray(rng.standard_normal(a.shape) * 0.3, jnp.float32)
    v = dict(v)
    v["batch_stats"] = flax.traverse_util.unflatten_dict(new)
    return m, v


@pytest.mark.parametrize(
    "start_level,extra", [(0, None), (1, "on_input")]
)
def test_detect_engine_matches_flax(start_level, extra):
    m, v = _setup(0, add_extra_convs=extra, start_level=start_level)
    sp = prepare_detect_params(jax.device_get(v), layers=LAYERS,
                               dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 64, 64, 3)), jnp.float32
    )
    want = m.apply(v, x, train=False)
    got = detect_forward(
        sp, x, layers=LAYERS, start_level=start_level,
        add_extra_convs=extra,
    )
    assert len(got) == len(want) == 5
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w),
                                   rtol=2e-3, atol=3e-4)


def test_detect_engine_microbatch_equal():
    """Chains are per-sample independent: split == unsplit (tight allclose —
    the CPU backend picks batch-size-dependent conv lowering with ~1e-7
    reduction reorder; on-chip the classification engine measured bitwise)."""
    m, v = _setup(2)
    sp = prepare_detect_params(jax.device_get(v), layers=LAYERS,
                               dtype=jnp.float32)
    x = jnp.asarray(
        np.random.default_rng(3).standard_normal((4, 64, 64, 3)), jnp.float32
    )
    full = detect_forward(sp, x, layers=LAYERS, microbatch=0)
    split = detect_forward(sp, x, layers=LAYERS, microbatch=2)
    for a, b in zip(full, split):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-5)
