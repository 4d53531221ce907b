"""CIFAR local loader + distillation-wired train step."""

import os
import pickle

import numpy as np
import jax
import jax.numpy as jnp
import optax

from mrla_tpu.data.cifar import CIFAR, iterate_cifar
from mrla_tpu.train import create_train_state, make_train_step
from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight


def _write_fake_cifar100(root):
    d = os.path.join(root, "cifar-100-python")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for name, n in [("train", 64), ("test", 32)]:
        batch = {
            b"data": rng.integers(0, 255, (n, 3072), dtype=np.uint8),
            b"fine_labels": list(rng.integers(0, 100, n)),
        }
        with open(os.path.join(d, name), "wb") as f:
            pickle.dump(batch, f)


def test_cifar_loader(tmp_path):
    _write_fake_cifar100(str(tmp_path))
    ds = CIFAR(str(tmp_path), train=True)
    assert len(ds) == 64 and ds.images.shape == (64, 32, 32, 3)
    batches = list(iterate_cifar(ds, np.arange(64), 16))
    assert len(batches) == 4 and batches[0]["image"].shape == (16, 32, 32, 3)


def test_distillation_train_step():
    student = ResNetMRLALight(layers=[1, 1], num_classes=10)
    teacher = ResNetMRLALight(layers=[1, 1], num_classes=10)
    sample = jnp.zeros((4, 32, 32, 3))
    t_vars = teacher.init(jax.random.key(1), sample, train=False)
    teacher_fn = lambda x: teacher.apply(t_vars, x, train=False)

    state = create_train_state(student, jax.random.key(0), sample,
                               optax.sgd(0.01, momentum=0.9))
    step = jax.jit(make_train_step(teacher_fn=teacher_fn, distill_kind="soft",
                                   distill_alpha=0.5, distill_tau=2.0))
    batch = {"image": jnp.asarray(np.random.default_rng(0).standard_normal(
        (4, 32, 32, 3)), jnp.float32), "label": jnp.arange(4) % 10}
    new_state, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1

    # hard distillation also runs
    step_h = jax.jit(make_train_step(teacher_fn=teacher_fn, distill_kind="hard"))
    _, m2 = step_h(state, batch, jax.random.key(2))
    assert np.isfinite(float(m2["loss"]))


def test_distillation_stats_free_model():
    """DeiT-style models carry NO batch_stats; the train step must not pass
    mutable=[] to flax (which still returns a tuple) — this exercises the
    stats-free branch with soft distillation end to end."""
    from mrla_tpu.models import create_model

    student = create_model("deit_tiny_patch16_224", num_classes=10,
                           img_size=32, drop_path_rate=0.1)
    teacher = create_model("deit_tiny_patch16_224", num_classes=10,
                           img_size=32)
    sample = jnp.zeros((4, 32, 32, 3))
    t_vars = teacher.init(jax.random.key(1), sample, train=False)
    teacher_fn = lambda x: teacher.apply(t_vars, x, train=False)

    state = create_train_state(student, jax.random.key(0), sample,
                               optax.sgd(0.01))
    assert not state.batch_stats  # precondition: genuinely stats-free
    step = jax.jit(make_train_step(teacher_fn=teacher_fn,
                                   distill_kind="soft", has_droppath=True))
    batch = {"image": jnp.asarray(np.random.default_rng(1).standard_normal(
        (4, 32, 32, 3)), jnp.float32), "label": jnp.arange(4) % 10}
    new_state, metrics = step(state, batch, jax.random.key(2))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 1


def test_soft_distillation_matches_reference_formula():
    """Soft distillation must equal the reference's
    kl_div(reduction='sum') * T^2 / numel (deit/losses.py:54-63) — i.e.
    divide by B*K, not just B."""
    from mrla_tpu.train.losses import distillation_loss

    rng = np.random.default_rng(0)
    B, K, tau, alpha = 3, 7, 2.0, 0.4
    s = rng.standard_normal((B, K)).astype(np.float32)
    t = rng.standard_normal((B, K)).astype(np.float32)
    base = 1.25

    def softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    p_t = softmax(t / tau)
    logp_s = np.log(softmax(s / tau))
    logp_t = np.log(p_t)
    kl_sum = float((p_t * (logp_t - logp_s)).sum())  # reduction='sum'
    want = base * (1 - alpha) + (kl_sum * tau * tau / (B * K)) * alpha

    got = float(distillation_loss(
        jnp.float32(base), jnp.asarray(s), jnp.asarray(t),
        kind="soft", alpha=alpha, tau=tau,
    ))
    np.testing.assert_allclose(got, want, rtol=1e-5)
