"""Optimizer parity vs torch.optim + schedule semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import torch

from mrla_tpu.train.optim import sgd_torch, rmsprop_tf
from mrla_tpu.train.schedules import (
    step_with_warmup,
    cosine_with_warmup,
    multistep_with_warmup,
    exponential_decay_with_warmup,
)


def test_sgd_torch_matches_torch():
    rng = np.random.default_rng(0)
    p0 = rng.standard_normal((4, 3)).astype(np.float32)
    grads = [rng.standard_normal((4, 3)).astype(np.float32) for _ in range(5)]

    tp = torch.nn.Parameter(torch.from_numpy(p0.copy()))
    opt = torch.optim.SGD([tp], lr=0.1, momentum=0.9, weight_decay=1e-4)
    for g in grads:
        tp.grad = torch.from_numpy(g)
        opt.step()

    tx = sgd_torch(0.1, momentum=0.9, weight_decay=1e-4)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    for g in grads:
        updates, state = tx.update({"w": jnp.asarray(g)}, state, params)
        params = optax.apply_updates(params, updates)

    np.testing.assert_allclose(
        np.asarray(params["w"]), tp.detach().numpy(), rtol=1e-5, atol=1e-6
    )


def test_rmsprop_tf_update_rule():
    # hand-check one step: sq0=1, g=1 -> sq=.9+.1=1.0; g'=1/sqrt(1+eps);
    # buf=g'; p = p - lr*buf
    tx = rmsprop_tf(0.1, decay=0.9, momentum=0.9, eps=1e-3)
    params = {"w": jnp.asarray([1.0])}
    state = tx.init(params)
    updates, state = tx.update({"w": jnp.asarray([1.0])}, state, params)
    params = optax.apply_updates(params, updates)
    expected = 1.0 - 0.1 * (1.0 / np.sqrt(1.0 + 1e-3))
    np.testing.assert_allclose(np.asarray(params["w"]), [expected], rtol=1e-6)


def test_step_schedule_reference_semantics():
    # resnet/train.py: 3 warmup epochs, /10 every 30
    s = step_with_warmup(0.1, steps_per_epoch=100, warmup_epochs=3)
    assert float(s(0)) < 0.001  # warmup start near 0
    np.testing.assert_allclose(float(s(300)), 0.1, rtol=1e-5)  # epoch 3
    np.testing.assert_allclose(float(s(29 * 100)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(s(30 * 100)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(s(60 * 100)), 0.001, rtol=1e-5)


def test_cosine_schedule():
    s = cosine_with_warmup(0.1, total_epochs=100, steps_per_epoch=10, warmup_epochs=5)
    np.testing.assert_allclose(float(s(50)), 0.1, rtol=2e-2)  # end of warmup
    np.testing.assert_allclose(float(s(1000)), 0.0, atol=1e-6)  # end
    mid = float(s(50 + (1000 - 50) // 2))
    np.testing.assert_allclose(mid, 0.05, rtol=0.05)


def test_multistep_and_exp_schedules():
    s = multistep_with_warmup(0.1, 10, milestones_epochs=(30, 60), warmup_epochs=0)
    np.testing.assert_allclose(float(s(299)), 0.1, rtol=1e-5)
    np.testing.assert_allclose(float(s(300)), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(s(600)), 0.001, rtol=1e-5)

    e = exponential_decay_with_warmup(0.048, 10, warmup_epochs=0)
    np.testing.assert_allclose(float(e(0)), 0.048, rtol=1e-4)
    np.testing.assert_allclose(float(e(24)), 0.048 * 0.97, rtol=1e-4)  # epoch 2.4
