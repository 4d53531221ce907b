"""Pipeline parallelism (parallel/pipeline.py): GPipe schedule over a 'pipe'
mesh axis must reproduce the single-device DeiT-MRLA forward exactly, and a
pipeline-parallel train step must produce the single-device gradients.

Reference scope note: the reference has NO pipeline parallelism (SURVEY.md
§2.4 — DP only); these tests guard additive TPU-native capability.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mrla_tpu.models.deit_mrla import ViTMRLA
from mrla_tpu.parallel import make_mesh
from mrla_tpu.parallel.pipeline import (
    make_pipelined_vit,
    pipeline_shardings,
    stack_block_params,
    unstack_block_params,
)

pytestmark = pytest.mark.skipif(
    jax.device_count() < 8, reason="needs the 8-virtual-device backend"
)


def _tiny_vit(depth=8):
    return ViTMRLA(
        patch_size=16,
        num_classes=13,
        embed_dim=32,
        depth=depth,
        num_heads=2,
        dim_mrla=16,
        variant="light",
    )


def _init(model, b=8, px=32, seed=0):
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal((b, px, px, 3)), jnp.float32
    )
    variables = model.init(jax.random.key(0), x, train=False)
    return variables["params"], x


def test_stack_roundtrip():
    model = _tiny_vit()
    params, _ = _init(model, b=2)
    stacked, rest = stack_block_params(params, model.depth)
    rebuilt = unstack_block_params(stacked, rest)
    assert jax.tree.structure(rebuilt) == jax.tree.structure(params)
    for a, b in zip(jax.tree.leaves(rebuilt), jax.tree.leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_pp_forward_matches_single_device():
    model = _tiny_vit(depth=8)
    params, x = _init(model)
    ref = model.apply({"params": params}, x, train=False)

    mesh = make_mesh(axes=("pipe",), shape=(4,), devices=jax.devices()[:4])
    forward, _ = make_pipelined_vit(model, mesh, num_microbatches=4)
    got = jax.jit(forward)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pp_forward_matches_on_dp_pipe_mesh():
    model = _tiny_vit(depth=8)
    params, x = _init(model, b=8, seed=1)
    ref = model.apply({"params": params}, x, train=False)

    mesh = make_mesh(axes=("data", "pipe"), shape=(2, 4))
    forward, _ = make_pipelined_vit(
        model, mesh, num_microbatches=2, data_axis="data"
    )
    got = jax.jit(forward)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pp_forward_plain_deit_distilled():
    """Plain DeiT (ViTBlock) with the distilled two-token layout pipelines
    through the same schedule; eval output is the (head+head_dist)/2
    average (models/deit.py:189-201)."""
    from mrla_tpu.models.deit import VisionTransformer

    model = VisionTransformer(
        patch_size=16, num_classes=11, embed_dim=32, depth=8, num_heads=2,
        distilled=True,
    )
    params, x = _init(model, b=8, px=32, seed=4)
    ref = model.apply({"params": params}, x, train=False)

    mesh = make_mesh(axes=("pipe",), shape=(4,), devices=jax.devices()[:4])
    forward, _ = make_pipelined_vit(model, mesh, num_microbatches=4)
    got = jax.jit(forward)(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)

    # train=True: the separate (cls, dist) pair the distillation objective
    # needs (models/deit.py:199 train-mode head semantics)
    ref_cls, ref_dist = model.apply({"params": params}, x, train=True)
    got_cls, got_dist = jax.jit(lambda p, x: forward(p, x, True))(params, x)
    np.testing.assert_allclose(np.asarray(got_cls), np.asarray(ref_cls), atol=2e-5)
    np.testing.assert_allclose(np.asarray(got_dist), np.asarray(ref_dist), atol=2e-5)


def test_pp_rejects_nonzero_drop_rates():
    """A model configured with stochastic depth must be refused (the
    pipelined graph is deterministic — silent drop-less training was the
    round-3 advisor finding)."""
    model = ViTMRLA(
        patch_size=16, num_classes=13, embed_dim=32, depth=8, num_heads=2,
        dim_mrla=16, variant="light", drop_path_rate=0.1,
    )
    mesh = make_mesh(axes=("pipe",), shape=(4,), devices=jax.devices()[:4])
    with pytest.raises(AssertionError, match="drop_path_rate"):
        make_pipelined_vit(model, mesh, num_microbatches=4)


def _ce(logits, labels):
    return optax.softmax_cross_entropy_with_integer_labels(logits, labels).mean()


def test_pp_grads_match_single_device():
    model = _tiny_vit(depth=8)
    params, x = _init(model, seed=2)
    labels = jnp.asarray(np.arange(8) % 13, jnp.int32)

    def ref_loss(p):
        return _ce(model.apply({"params": p}, x, train=False), labels)

    mesh = make_mesh(axes=("pipe",), shape=(4,), devices=jax.devices()[:4])
    forward, _ = make_pipelined_vit(model, mesh, num_microbatches=4)

    def pp_loss(p):
        return _ce(forward(p, x), labels)

    g_ref = jax.grad(ref_loss)(params)
    g_pp = jax.jit(jax.grad(pp_loss))(params)
    flat_ref = jax.tree.leaves(g_ref)
    flat_pp = jax.tree.leaves(g_pp)
    assert len(flat_ref) == len(flat_pp)
    for a, b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)


def test_pp_train_step_stacked_layout():
    """Production layout: stacked block params sharded P('pipe') through a
    full SGD step; result must equal the single-device step."""
    model = _tiny_vit(depth=8)
    params, x = _init(model, seed=3)
    labels = jnp.asarray(np.arange(8) % 13, jnp.int32)
    tx = optax.sgd(0.1, momentum=0.9)

    # single-device reference step
    def ref_loss(p):
        return _ce(model.apply({"params": p}, x, train=False), labels)

    g = jax.grad(ref_loss)(params)
    upd, _ = tx.update(g, tx.init(params))
    ref_params = optax.apply_updates(params, upd)

    mesh = make_mesh(axes=("pipe",), shape=(4,), devices=jax.devices()[:4])
    _, fwd_stacked = make_pipelined_vit(model, mesh, num_microbatches=4)
    stacked, rest = stack_block_params(params, model.depth)
    stacked = jax.device_put(stacked, pipeline_shardings(mesh, stacked))
    opt_state = tx.init((stacked, rest))

    @jax.jit
    def step(stacked, rest, opt_state):
        def loss_fn(sr):
            return _ce(fwd_stacked(sr[0], sr[1], x), labels)

        loss, grads = jax.value_and_grad(loss_fn)((stacked, rest))
        updates, opt_state = tx.update(grads, opt_state)
        (stacked, rest) = optax.apply_updates((stacked, rest), updates)
        return stacked, rest, opt_state, loss

    with mesh:
        new_stacked, new_rest, _, loss = step(stacked, rest, opt_state)
    assert np.isfinite(float(loss))
    got = unstack_block_params(new_stacked, new_rest)
    for a, b in zip(jax.tree.leaves(got), jax.tree.leaves(ref_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5)
