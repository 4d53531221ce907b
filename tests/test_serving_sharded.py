"""DP sharded serving: shard_map over 'data' must match the single-device
engine (no collectives, per-sample math).  Tolerance note: per-device local
batch (2) compiles a different conv reduction order than the global batch
(16) on the CPU test backend, so the bar is tight-allclose, not bitwise."""

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.models import create_model
from mrla_tpu.parallel.mesh import make_mesh, shard_batch
from mrla_tpu.serving import prepare_inference_params, resnet_mrlal_forward
from mrla_tpu.serving.sharded import make_sharded_forward


def test_sharded_serving_matches_single_device():
    assert jax.device_count() >= 8, "conftest forces 8 virtual CPU devices"
    mesh = make_mesh(axes=("data",), shape=(8,))

    model = create_model("resnet50_mrlal")
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32), train=False
    )
    sp = prepare_inference_params(jax.device_get(variables))
    x_np = np.random.default_rng(6).standard_normal((16, 64, 64, 3)).astype(
        np.float32
    )

    want = np.asarray(resnet_mrlal_forward(sp, jnp.asarray(x_np), microbatch=0))

    fwd = make_sharded_forward(mesh, microbatch=0)
    x_sharded = shard_batch({"x": x_np}, mesh)["x"]
    got = np.asarray(fwd(sp, x_sharded))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-2)

    # and with per-device microbatch chains on (2 rows/device -> chains of
    # 1; the 1-row conv program again reduces in a different order on CPU)
    fwd_mb = make_sharded_forward(mesh, microbatch=1)
    got_mb = np.asarray(fwd_mb(sp, x_sharded))
    np.testing.assert_allclose(got_mb, want, rtol=1e-3, atol=1e-2)


def test_sharded_detection_serving_matches_single_device():
    """The FULL native detector (forward + decode + NMS) under shard_map
    DP: per-image math only, so 8-way sharding must reproduce the
    single-device detections (boxes can differ by conv reduction order;
    labels/validity must match exactly)."""
    from mrla_tpu.detect.retinanet import RetinaNet, get_bboxes

    assert jax.device_count() >= 8
    mesh = make_mesh(axes=("data",), shape=(8,))
    model = RetinaNet(layers=(1, 1, 1, 1), num_classes=3)
    v = model.init(jax.random.key(0), jnp.zeros((1, 128, 128, 3)),
                   train=False)

    def detector_fwd(variables, x):
        outs = model.apply(variables, x, train=False)
        return get_bboxes(outs, img_shape=(128, 128), score_thr=0.005,
                          max_per_img=5)

    x_np = np.random.default_rng(7).standard_normal(
        (16, 128, 128, 3)
    ).astype(np.float32)
    wb, ws, wl, wv = [np.asarray(o) for o in detector_fwd(
        v, jnp.asarray(x_np)
    )]

    fwd = make_sharded_forward(mesh, forward=detector_fwd)
    x_sharded = shard_batch({"x": x_np}, mesh)["x"]
    gb, gs, gl, gv = [np.asarray(o) for o in fwd(v, x_sharded)]
    np.testing.assert_array_equal(gv, wv)
    np.testing.assert_array_equal(gl[wv], wl[wv])
    np.testing.assert_allclose(gs[wv], ws[wv], rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(gb[wv], wb[wv], rtol=1e-3, atol=0.5)
