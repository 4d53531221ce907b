"""scan_adapter round-trip: stacked <-> unrolled params are interchangeable."""

import numpy as np
import jax
import jax.numpy as jnp

from mrla_tpu.ckpt.scan_adapter import stack_scan_params, unstack_scan_params
from mrla_tpu.models.resnet_mrla_base import ResNetMRLABase

LAYERS = [2, 3]


def test_round_trip_and_cross_model():
    scan_model = ResNetMRLABase(layers=LAYERS, num_classes=10, use_scan=True)
    unrolled = ResNetMRLABase(layers=LAYERS, num_classes=10, use_scan=False)

    x0 = jnp.zeros((2, 32, 32, 3))
    vs = jax.device_get(scan_model.init(jax.random.key(0), x0, train=False))

    # stacked -> unrolled -> stacked round trip
    up = unstack_scan_params(vs["params"])
    us = jax.device_get(vs["batch_stats"])
    up_stats = unstack_scan_params(us)
    back = stack_scan_params(up, LAYERS)
    for (k1, a), (k2, b) in zip(
        sorted(jax.tree_util.tree_leaves_with_path(vs["params"]),
               key=lambda t: str(t[0])),
        sorted(jax.tree_util.tree_leaves_with_path(back),
               key=lambda t: str(t[0])),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # cross-model logits agree
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 32, 32, 3)),
                    jnp.float32)
    got_scan = scan_model.apply(vs, x, train=False)
    got_unrl = unrolled.apply(
        {"params": up, "batch_stats": up_stats}, x, train=False
    )
    np.testing.assert_allclose(np.asarray(got_scan), np.asarray(got_unrl),
                               rtol=1e-4, atol=1e-5)
