"""Data-parallel training on the 8-virtual-device CPU mesh (SURVEY.md §4.3)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mrla_tpu.models import create_model
from mrla_tpu.parallel import make_mesh, shard_batch
from mrla_tpu.train import create_train_state, make_train_step, make_eval_step


def _tiny_state(rng_seed=0, num_classes=10):
    # full flagship depth is slow to compile on the 1-core CPU backend; a
    # 2-stage instance still covers stem/downsample/MRLA-epilogue fwd+bwd.
    from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight

    model = ResNetMRLALight(layers=[1, 1], num_classes=num_classes)
    sample = jnp.zeros((8, 32, 32, 3), jnp.float32)
    tx = optax.sgd(0.05, momentum=0.9)
    state = create_train_state(model, jax.random.key(rng_seed), sample, tx)
    return model, state


def test_train_step_dp_8devices():
    mesh = make_mesh(axes=("data", "model"), shape=(8, 1))
    model, state = _tiny_state()
    rng = np.random.default_rng(0)
    batch = {
        "image": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
        "label": (np.arange(16) % 10).astype(np.int32),
    }

    state = jax.device_put(state, NamedSharding(mesh, P()))
    sharded = shard_batch(batch, mesh)
    step = jax.jit(make_train_step())

    losses = []
    with mesh:
        for i in range(5):
            state, metrics = step(state, sharded, jax.random.key(1))
            losses.append(float(metrics["loss"]))
    assert int(state.step) == 5
    assert all(np.isfinite(l) for l in losses)
    # same batch repeatedly => loss must drop
    assert losses[-1] < losses[0]


def test_dp_matches_single_device():
    """Gradient all-reduce correctness: 8-way DP == single-device step."""
    model, state = _tiny_state()
    rng = np.random.default_rng(1)
    batch = {
        "image": rng.standard_normal((16, 32, 32, 3)).astype(np.float32),
        "label": (np.arange(16) % 10).astype(np.int32),
    }
    step = make_train_step()

    # single device
    s1, m1 = jax.jit(step)(state, jax.tree.map(jnp.asarray, batch), jax.random.key(2))

    # 8-way data parallel
    mesh = make_mesh(axes=("data", "model"), shape=(8, 1))
    state8 = jax.device_put(state, NamedSharding(mesh, P()))
    with mesh:
        s8, m8 = jax.jit(step)(state8, shard_batch(batch, mesh), jax.random.key(2))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_eval_step_topk():
    model, state = _tiny_state()
    rng = np.random.default_rng(2)
    batch = {
        "image": rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
        "label": (np.arange(8) % 10).astype(np.int32),
    }
    ev = jax.jit(make_eval_step())
    out = ev(state, jax.tree.map(jnp.asarray, batch))
    assert int(out["count"]) == 8
    assert 0 <= int(out["top1"]) <= int(out["top5"]) <= 8


def test_tp_sharding_rules():
    """TP over 'model': large kernels shard on the output channel; loss
    matches the replicated run."""
    from jax.sharding import PartitionSpec as P

    from mrla_tpu.parallel import tp_shardings, shard_train_state

    mesh = make_mesh(axes=("data", "model"), shape=(4, 2))
    model, state = _tiny_state()
    sh = tp_shardings(state.params, mesh, min_elements=1 << 10)
    import flax

    flat_p = flax.traverse_util.flatten_dict(state.params)
    flat_s = flax.traverse_util.flatten_dict(sh)
    sharded = [k for k in flat_p
               if flat_s[k].spec != P() and flat_p[k].ndim >= 2]
    assert sharded, "expected at least one TP-sharded kernel"
    for k in sharded:
        assert flat_p[k].shape[-1] % 2 == 0

    rng = np.random.default_rng(3)
    batch = {
        "image": rng.standard_normal((8, 32, 32, 3)).astype(np.float32),
        "label": (np.arange(8) % 10).astype(np.int32),
    }
    step = make_train_step()
    s_ref, m_ref = jax.jit(step)(state, jax.tree.map(jnp.asarray, batch),
                                 jax.random.key(0))
    state_tp = shard_train_state(state, mesh)
    with mesh:
        s_tp, m_tp = jax.jit(step)(state_tp, shard_batch(batch, mesh),
                                   jax.random.key(0))
    np.testing.assert_allclose(float(m_ref["loss"]), float(m_tp["loss"]),
                               rtol=1e-5)
