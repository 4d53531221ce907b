"""LR schedules with reference-matching semantics.

  * step_with_warmup — resnet/train.py:537-566: linear warmup for
    ``warmup_epochs`` then lr·0.1^(epoch//30), evaluated per step.
  * cosine_with_warmup — resnet/utils.py:6-36 (train_pro, per-iteration
    cosine with ``warmup_epochs`` linear warmup from near 0).
  * multistep_with_warmup — resnet/utils.py:38-63 (milestone decay).
  * deit_cosine — timm create_scheduler semantics used by deit/main.py:315:
    per-epoch cosine from lr to min_lr over epochs with warmup_lr start.

All return optax-style ``schedule(step) -> lr`` on the global step axis
(steps_per_epoch converts the reference's per-epoch rules).
"""

from __future__ import annotations

import jax.numpy as jnp


def step_with_warmup(
    base_lr: float,
    steps_per_epoch: int,
    warmup_epochs: int = 3,
    decay_every_epochs: int = 30,
    decay_factor: float = 0.1,
):
    def schedule(step):
        epoch = step / steps_per_epoch
        warm = base_lr * (epoch + 1e-8) / max(warmup_epochs, 1e-8)
        decayed = base_lr * decay_factor ** jnp.floor(epoch / decay_every_epochs)
        return jnp.where(
            (warmup_epochs > 0) & (epoch < warmup_epochs), warm, decayed
        )

    return schedule


def cosine_with_warmup(
    base_lr: float,
    total_epochs: int,
    steps_per_epoch: int,
    warmup_epochs: int = 5,
    min_lr: float = 0.0,
):
    total_steps = total_epochs * steps_per_epoch
    warmup_steps = warmup_epochs * steps_per_epoch

    def schedule(step):
        warm = base_lr * (step + 1) / jnp.maximum(warmup_steps, 1)
        t = (step - warmup_steps) / jnp.maximum(total_steps - warmup_steps, 1)
        cos = min_lr + 0.5 * (base_lr - min_lr) * (1 + jnp.cos(jnp.pi * t))
        return jnp.where((warmup_steps > 0) & (step < warmup_steps), warm, cos)

    return schedule


def multistep_with_warmup(
    base_lr: float,
    steps_per_epoch: int,
    milestones_epochs=(30, 60, 90),
    decay_factor: float = 0.1,
    warmup_epochs: int = 5,
):
    def schedule(step):
        epoch = step / steps_per_epoch
        warm = base_lr * (step + 1) / jnp.maximum(warmup_epochs * steps_per_epoch, 1)
        n = sum((epoch >= m).astype(jnp.float32) for m in jnp.array(milestones_epochs))
        decayed = base_lr * decay_factor ** n
        return jnp.where((warmup_epochs > 0) & (epoch < warmup_epochs), warm, decayed)

    return schedule


def exponential_decay_with_warmup(
    base_lr: float,
    steps_per_epoch: int,
    decay_epochs: float = 2.4,
    decay_factor: float = 0.97,
    warmup_epochs: int = 3,
    warmup_lr: float = 1e-6,
):
    """timm 'step' scheduler of the EfficientNet recipe (decay .97/2.4ep)."""

    def schedule(step):
        epoch = step / steps_per_epoch
        warm = warmup_lr + (base_lr - warmup_lr) * epoch / max(warmup_epochs, 1e-8)
        decayed = base_lr * decay_factor ** jnp.floor(epoch / decay_epochs)
        return jnp.where((warmup_epochs > 0) & (epoch < warmup_epochs), warm, decayed)

    return schedule
