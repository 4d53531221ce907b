"""Classification losses.

Parity: CrossEntropyLabelSmooth ε=0.1 (/root/reference/resnet/utils.py:66-113)
computes mean-over-batch of -(sum((1-ε)·onehot + ε/K) · log_softmax).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array) -> jax.Array:
    """Mean CE over the batch; integer labels."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
    return jnp.mean(nll)


def label_smoothing_ce(
    logits: jax.Array, labels: jax.Array, epsilon: float = 0.1
) -> jax.Array:
    """Label-smoothed CE matching the reference's CrossEntropyLabelSmooth."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    targets = (1.0 - epsilon) * onehot + epsilon / num_classes
    return jnp.mean(-jnp.sum(targets * logp, axis=-1))


def soft_target_ce(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """CE against soft targets (mixup/cutmix paths; timm SoftTargetCrossEntropy)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return jnp.mean(-jnp.sum(targets.astype(jnp.float32) * logp, axis=-1))


def distillation_loss(
    base_loss: jax.Array,
    student_dist_logits: jax.Array,
    teacher_logits: jax.Array,
    kind: str = "none",
    alpha: float = 0.5,
    tau: float = 1.0,
) -> jax.Array:
    """DeiT distillation (reference deit/losses.py:10-70).

    kind='soft': KL(student/τ || teacher/τ)·τ², blended with base loss by α.
    kind='hard': CE against teacher argmax.
    kind='none': base loss unchanged.
    """
    if kind == "none":
        return base_loss
    s = student_dist_logits.astype(jnp.float32)
    t = teacher_logits.astype(jnp.float32)
    if kind == "soft":
        logp_s = jax.nn.log_softmax(s / tau, axis=-1)
        p_t = jax.nn.softmax(t / tau, axis=-1)
        # KL(p_t || p_s) summed, τ² scaled, divided by numel = B*K — the
        # reference's "legacy PyTorch behavior" (deit/losses.py:54-63,
        # kl_div(reduction='sum') * T*T / outputs_kd.numel()).  Without
        # the /K the term is num_classes times too large and dominates
        # the blended loss.
        logp_t = jax.nn.log_softmax(t / tau, axis=-1)
        kl = jnp.sum(p_t * (logp_t - logp_s), axis=-1)
        dist = jnp.mean(kl) * (tau ** 2) / s.shape[-1]
    elif kind == "hard":
        dist = cross_entropy(s, jnp.argmax(t, axis=-1))
    else:
        raise ValueError(f"unknown distillation kind: {kind}")
    return base_loss * (1.0 - alpha) + dist * alpha
