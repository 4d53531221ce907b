"""Stochastic depth (per-sample DropPath).

Reference behavior: /root/reference/resnet/models/utils/drop.py:7-35 — binary
keep mask per sample, output scaled by 1/keep_prob.  JAX version threads an
explicit PRNG key (deterministic by construction; keys are rank-folded by the
trainer, matching the reference's rank-offset seeding noted in SURVEY.md §5.2).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def drop_path(
    x: jax.Array,
    rate: float,
    key: jax.Array | None,
    deterministic: bool,
) -> jax.Array:
    """Drop the whole residual branch per sample with probability ``rate``."""
    if deterministic or rate == 0.0:
        return x
    if key is None:
        raise ValueError("drop_path requires a PRNG key in non-deterministic mode")
    keep = 1.0 - rate
    shape = (x.shape[0],) + (1,) * (x.ndim - 1)
    mask = jax.random.bernoulli(key, p=keep, shape=shape)
    return jnp.where(mask, x / keep, jnp.zeros_like(x)).astype(x.dtype)
