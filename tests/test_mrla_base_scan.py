"""lax.scan MRLA-base stages == unrolled stages (same params, same logits)."""

import numpy as np
import jax
import jax.numpy as jnp
import flax

from mrla_tpu.models.resnet_mrla_base import ResNetMRLABase

LAYERS = [2, 3]  # exercises a scanned stage of length 1 and of length 2


from mrla_tpu.ckpt.scan_adapter import unstack_scan_params as _unstack_scan_params


def test_scan_matches_unrolled_eval():
    scan_model = ResNetMRLABase(layers=LAYERS, num_classes=10, use_scan=True)
    unrolled = ResNetMRLABase(layers=LAYERS, num_classes=10, use_scan=False)

    x0 = jnp.zeros((2, 32, 32, 3))
    vs = scan_model.init(jax.random.key(0), x0, train=False)
    vu = {
        "params": _unstack_scan_params(vs["params"]),
        "batch_stats": _unstack_scan_params(vs["batch_stats"]),
    }
    # sanity: unrolled model accepts the converted tree
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    got_scan = scan_model.apply(vs, x, train=False)
    got_unrl = unrolled.apply(vu, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got_scan), np.asarray(got_unrl), rtol=1e-4, atol=1e-5
    )


def test_scan_train_step_runs():
    import optax

    from mrla_tpu.train import create_train_state, make_train_step

    model = ResNetMRLABase(layers=[1, 2], num_classes=10, use_scan=True,
                           drop_path=0.1)
    sample = jnp.zeros((2, 32, 32, 3))
    state = create_train_state(model, jax.random.key(0), sample,
                               optax.sgd(0.01))
    step = jax.jit(make_train_step(has_droppath=True))
    batch = {"image": jnp.asarray(
        np.random.default_rng(1).standard_normal((2, 32, 32, 3)), jnp.float32),
        "label": jnp.arange(2) % 10}
    new_state, metrics = step(state, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["loss"]))
