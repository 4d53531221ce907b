"""Detection under the 8-virtual-device DP mesh (SURVEY.md §4.3).

The detection loss path has structure the classifier DP tests cannot
cover: per-image vmapped MaxIoU assignment (a fori_loop over the gt
axis), a GLOBAL avg_factor normalization (sum of positives across the
whole batch — under GSPMD this must all-reduce, not normalize per
shard), and fixed-shape NMS in the eval path.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from mrla_tpu.detect import RetinaNet, retinanet_loss
from mrla_tpu.parallel import make_mesh


def _setup():
    model = RetinaNet(layers=(1, 1, 1, 1), num_classes=4)
    variables = model.init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3), jnp.float32),
        train=False,
    )
    rng = np.random.default_rng(0)
    batch = 16
    images = jnp.asarray(
        rng.standard_normal((batch, 64, 64, 3)), jnp.float32
    )
    xy = rng.uniform(4, 24, (batch, 2, 2))
    wh = rng.uniform(12, 32, (batch, 2, 2))
    gb = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    gl = jnp.asarray(rng.integers(0, 4, (batch, 2)), jnp.int32)
    gv = jnp.asarray(rng.random((batch, 2)) < 0.8)
    return model, variables, images, gb, gl, gv


def _grad_step(model):
    def step(params, batch_stats, images, gb, gl, gv):
        def loss_fn(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": batch_stats},
                images, train=True, mutable=["batch_stats"],
            )
            l = retinanet_loss(outs, gb, gl, gv, num_classes=4)
            return l["loss"], l

        (loss, l), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        return loss, l["num_pos"], grads

    return step


def test_retinanet_dp_matches_single_device():
    model, variables, images, gb, gl, gv = _setup()
    step = _grad_step(model)

    loss1, npos1, grads1 = jax.jit(step)(
        variables["params"], variables["batch_stats"], images, gb, gl, gv
    )

    mesh = make_mesh(axes=("data", "model"), shape=(8, 1))
    rep = NamedSharding(mesh, P())
    params8 = jax.device_put(variables["params"], rep)
    bs8 = jax.device_put(variables["batch_stats"], rep)
    img8 = jax.device_put(
        images, NamedSharding(mesh, P("data", None, None, None))
    )
    gb8 = jax.device_put(gb, NamedSharding(mesh, P("data", None, None)))
    gl8 = jax.device_put(gl, NamedSharding(mesh, P("data", None)))
    gv8 = jax.device_put(gv, NamedSharding(mesh, P("data", None)))
    with mesh:
        loss8, npos8, grads8 = jax.jit(step)(
            params8, bs8, img8, gb8, gl8, gv8
        )

    # the avg_factor (global positive count) must agree exactly
    assert int(npos1) == int(npos8)
    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-5)
    # grads: fp32 reduction-order noise only — detection losses reduce
    # over ~110k anchors with heavy cancellation, so the sharded
    # all-reduce's reordering shows up at eps·Σ|terms| ≈ 1e-4 absolute
    # (observed 7e-5 max).  A shard-LOCAL normalization bug (the failure
    # mode under test: avg_factor must be the global positive count)
    # would produce O(1) relative errors, far outside this band.
    for a, b in zip(jax.tree.leaves(grads1), jax.tree.leaves(grads8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-4
        )


def test_retinanet_dp_training_steps():
    model, variables, images, gb, gl, gv = _setup()
    mesh = make_mesh(axes=("data", "model"), shape=(8, 1))
    rep = NamedSharding(mesh, P())
    params = jax.device_put(variables["params"], rep)
    bstats = jax.device_put(variables["batch_stats"], rep)
    img8 = jax.device_put(
        images, NamedSharding(mesh, P("data", None, None, None))
    )
    gb8 = jax.device_put(gb, NamedSharding(mesh, P("data", None, None)))
    gl8 = jax.device_put(gl, NamedSharding(mesh, P("data", None)))
    gv8 = jax.device_put(gv, NamedSharding(mesh, P("data", None)))
    tx = optax.adam(1e-3)
    opt_state = jax.device_put(tx.init(params), rep)

    @jax.jit
    def train_step(params, bstats, opt_state):
        def loss_fn(p):
            outs, mut = model.apply(
                {"params": p, "batch_stats": bstats},
                img8, train=True, mutable=["batch_stats"],
            )
            l = retinanet_loss(outs, gb8, gl8, gv8, num_classes=4)
            return l["loss"], mut["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), bstats, opt_state, loss

    # mechanics under the mesh: several optimizer+BN-mutation steps run,
    # stay finite, and actually move the params.  (LEARNING is proven by
    # the on-chip CLI smoke, scripts/train_smoke_detect_tpu.py — 6 steps
    # of from-scratch detection loss is not monotone and must not gate.)
    p0 = jax.tree.map(np.asarray, jax.device_get(params))
    losses = []
    with mesh:
        for _ in range(4):
            params, bstats, opt_state, loss = train_step(
                params, bstats, opt_state
            )
            losses.append(float(loss))
    assert all(np.isfinite(l) for l in losses)
    moved = jax.tree.leaves(
        jax.tree.map(
            lambda a, b: float(np.max(np.abs(np.asarray(a) - b))),
            jax.device_get(params), p0,
        )
    )
    assert max(moved) > 1e-5


def test_faster_rcnn_dp_matches_single_device():
    """Two-stage DP (round 5): the faster_rcnn train loss adds structure
    retinanet cannot cover under GSPMD — RPN proposal decode + NMS per
    image, RandomSampler with a threaded PRNG key, RoIAlign's gather
    over sharded features, and the sampled-count loss normalizations.
    The sharded loss and grads must match the single-device run."""
    from mrla_tpu.detect.two_stage import FasterRCNN, init_detector
    from mrla_tpu.detect.two_stage_train import faster_rcnn_train_loss

    model = FasterRCNN(
        layers=(1, 1, 1, 1), num_classes=4, rpn_nms_pre=64,
        num_proposals=32,
    )
    rng = np.random.default_rng(5)
    batch = 8
    images = jnp.asarray(
        rng.standard_normal((batch, 64, 64, 3)), jnp.float32
    )
    variables = init_detector(model, jax.random.key(0), images[:1])
    xy = rng.uniform(4, 24, (batch, 2, 2))
    wh = rng.uniform(12, 32, (batch, 2, 2))
    gb = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    gl = jnp.asarray(rng.integers(0, 4, (batch, 2)), jnp.int32)
    gv = jnp.asarray(rng.random((batch, 2)) < 0.9)
    key = jax.random.key(3)

    def step(params, images, gb, gl, gv):
        def loss_fn(p):
            total, losses, _ = faster_rcnn_train_loss(
                model,
                {"params": p,
                 "batch_stats": variables.get("batch_stats", {})},
                images, gb, gl, gv, key, train=False, rcnn_num=16,
            )
            return total, losses

        (loss, l), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params
        )
        return loss, grads

    loss1, grads1 = jax.jit(step)(variables["params"], images, gb, gl, gv)

    mesh = make_mesh(axes=("data",), shape=(8,))
    rep = NamedSharding(mesh, P())
    params8 = jax.device_put(variables["params"], rep)
    img8 = jax.device_put(
        images, NamedSharding(mesh, P("data", None, None, None))
    )
    gb8 = jax.device_put(gb, NamedSharding(mesh, P("data", None, None)))
    gl8 = jax.device_put(gl, NamedSharding(mesh, P("data", None)))
    gv8 = jax.device_put(gv, NamedSharding(mesh, P("data", None)))
    with mesh:
        loss8, grads8 = jax.jit(step)(params8, img8, gb8, gl8, gv8)

    np.testing.assert_allclose(float(loss1), float(loss8), rtol=1e-4)
    for a, b in zip(jax.tree.leaves(grads1), jax.tree.leaves(grads8)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=2e-4
        )
