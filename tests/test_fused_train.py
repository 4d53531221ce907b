"""Fused custom-VJP train epilogue == module path (values AND gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight
from mrla_tpu.ops.fused_train import (
    fused_epilogue_module_equivalent,
    fused_light_epilogue_train,
)
from mrla_tpu.ops.mrla import MRLAParams


def _op_inputs(seed=0, b=2, h=8, w=8, c=32, heads=2):
    rng = np.random.default_rng(seed)
    f = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    out = jax.nn.relu(f(b, h, w, c))
    identity = f(b, h, w, c)
    wq = f(3) * 0.3
    wk = f(3) * 0.3
    wv = f(3, 3, 1, c) * 0.3
    lam = f(c) * 0.5
    scale = f(c) * 0.2 + 1.0
    bias = f(c) * 0.2
    return out, identity, wq, wk, wv, lam, scale, bias, heads


def test_fused_op_forward_matches_composition():
    out, identity, wq, wk, wv, lam, scale, bias, heads = _op_inputs()
    ret, mean, var = fused_light_epilogue_train(
        out, identity, wq, wk, wv, lam, scale, bias, heads
    )
    params = MRLAParams(wq=wq, wk=wk, wv=wv)
    ret2, mean2, var2 = fused_epilogue_module_equivalent(
        out, identity, params, lam, scale, bias, heads
    )
    np.testing.assert_allclose(np.asarray(ret), np.asarray(ret2),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(var), np.asarray(var2), rtol=1e-5,
                               atol=1e-7)


def test_fused_op_gradients_match_autodiff():
    out, identity, wq, wk, wv, lam, scale, bias, heads = _op_inputs(1)

    def loss_fused(args):
        ret, mean, var = fused_light_epilogue_train(*args, heads)
        # touch all three outputs so every cotangent path is exercised
        return (jnp.sum(ret ** 2) + jnp.sum(mean * 0.1)
                + jnp.sum(var * 0.05))

    def loss_ref(args):
        o, i, q, k, v, l, s, bi = args
        ret, mean, var = fused_epilogue_module_equivalent(
            o, i, MRLAParams(wq=q, wk=k, wv=v), l, s, bi, heads
        )
        return (jnp.sum(ret ** 2) + jnp.sum(mean * 0.1)
                + jnp.sum(var * 0.05))

    args = (out, identity, wq, wk, wv, lam, scale, bias)
    g1 = jax.grad(loss_fused)(args)
    g2 = jax.grad(loss_ref)(args)
    names = ["out", "identity", "wq", "wk", "wv", "lam", "scale", "bias"]
    for n, a, b in zip(names, g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
            err_msg=f"grad mismatch for {n}",
        )


def test_fused_model_train_step_matches_unfused():
    """Whole-model A/B: same init tree, one SGD step, same loss / params /
    batch_stats (fp32, tight tolerance)."""
    from mrla_tpu.train import create_train_state, make_train_step

    layers = [1, 1]
    rng = np.random.default_rng(3)
    batch = {
        "image": rng.standard_normal((4, 32, 32, 3)).astype(np.float32),
        "label": (np.arange(4) % 10).astype(np.int32),
    }
    m_ref = ResNetMRLALight(layers=layers, num_classes=10)
    m_fused = ResNetMRLALight(layers=layers, num_classes=10,
                              fused_epilogue=True)
    tx = optax.sgd(0.05, momentum=0.9)
    state_ref = create_train_state(m_ref, jax.random.key(0),
                                   jnp.zeros((2, 32, 32, 3)), tx)
    # identical init: reuse the ref variables (trees are identical by design)
    state_fused = create_train_state(
        m_fused, jax.random.key(0), jnp.zeros((2, 32, 32, 3)), tx,
        variables={"params": state_ref.params,
                   "batch_stats": state_ref.batch_stats},
    )
    step = make_train_step()
    s1, met1 = jax.jit(step)(state_ref, jax.tree.map(jnp.asarray, batch),
                             jax.random.key(1))
    s2, met2 = jax.jit(step)(state_fused, jax.tree.map(jnp.asarray, batch),
                             jax.random.key(1))
    np.testing.assert_allclose(float(met1["loss"]), float(met2["loss"]),
                               rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-5)
    for a, b in zip(jax.tree.leaves(s1.batch_stats),
                    jax.tree.leaves(s2.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_fused_model_eval_path_unchanged():
    """fused_epilogue only affects train mode; eval goes through the
    standard running-stat path and must be IDENTICAL."""
    layers = [1, 1]
    m_ref = ResNetMRLALight(layers=layers, num_classes=10)
    m_fused = ResNetMRLALight(layers=layers, num_classes=10,
                              fused_epilogue=True)
    v = m_ref.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)), train=False)
    x = jnp.asarray(
        np.random.default_rng(4).standard_normal((2, 32, 32, 3)), jnp.float32
    )
    a = m_ref.apply(v, x, train=False)
    b = m_fused.apply(v, x, train=False)
    assert jnp.array_equal(a, b)
