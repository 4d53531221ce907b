"""Optimizers with torch/timm-matching semantics.

  * sgd_torch — torch.optim.SGD as used by resnet/train.py:199: weight decay
    COUPLED into the gradient before the momentum buffer (grad += wd·param;
    buf = m·buf + grad; update = -lr·buf).
  * adamw_timm — AdamW with the timm no-decay convention (no wd on 1-D
    params, biases, or the ViT tokens), deit/main.py:315-318.
  * rmsprop_tf — timm's TF-style RMSprop of the EfficientNet recipe
    (README.md:103).  Differences from optax.rmsprop (SURVEY.md §7 hard
    parts): eps is added INSIDE the sqrt, the square-average accumulator is
    initialized to ONES (not zeros), and weight decay is coupled into the
    gradient.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import optax

ScalarOrSchedule = Union[float, Callable]


def _scale_by_lr(lr: ScalarOrSchedule):
    if callable(lr):
        return optax.scale_by_schedule(lambda step: -lr(step))
    return optax.scale(-lr)


def sgd_torch(
    learning_rate: ScalarOrSchedule,
    momentum: float = 0.9,
    weight_decay: float = 0.0,
    nesterov: bool = False,
    wd_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    parts = []
    if weight_decay > 0:
        wd = optax.add_decayed_weights(weight_decay, mask=wd_mask)
        parts.append(wd)
    if momentum > 0:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    parts.append(_scale_by_lr(learning_rate))
    return optax.chain(*parts)


def no_decay_mask(params) -> Any:
    """timm convention: decay only >=2-D kernels; skip biases, norm scales,
    λ vectors, tokens, and pos embeddings."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {
        k: (v.ndim >= 2 and k[-1] not in ("pos_embed", "cls_token", "dist_token"))
        for k, v in flat.items()
    }
    return flax.traverse_util.unflatten_dict(mask)


def adamw_timm(
    learning_rate: ScalarOrSchedule,
    params,
    weight_decay: float = 0.05,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
) -> optax.GradientTransformation:
    return optax.adamw(
        learning_rate,
        b1=b1,
        b2=b2,
        eps=eps,
        weight_decay=weight_decay,
        mask=no_decay_mask(params),
    )


class RMSpropTFState(NamedTuple):
    square_avg: Any
    mom: Any


def rmsprop_tf(
    learning_rate: ScalarOrSchedule,
    decay: float = 0.9,
    momentum: float = 0.9,
    eps: float = 1e-3,
    weight_decay: float = 0.0,
    wd_mask: Optional[Any] = None,
) -> optax.GradientTransformation:
    """TF1-style RMSprop (timm RMSpropTF).

    update rule per tensor:
        sq <- decay·sq + (1-decay)·g²         (sq initialized to ONES)
        g' <- g / sqrt(sq + eps)              (eps INSIDE the sqrt)
        buf <- momentum·buf + g'
        p  <- p - lr·buf
    """

    def init(params):
        return RMSpropTFState(
            square_avg=jax.tree.map(jnp.ones_like, params),
            mom=jax.tree.map(jnp.zeros_like, params),
        )

    def update(grads, state, params):
        sq = jax.tree.map(
            lambda s, g: decay * s + (1.0 - decay) * jnp.square(g),
            state.square_avg,
            grads,
        )
        gn = jax.tree.map(lambda g, s: g * jax.lax.rsqrt(s + eps), grads, sq)
        mom = jax.tree.map(lambda b, g: momentum * b + g, state.mom, gn)
        return mom, RMSpropTFState(square_avg=sq, mom=mom)

    core = optax.GradientTransformation(init, update)
    parts = []
    if weight_decay > 0:
        parts.append(optax.add_decayed_weights(weight_decay, mask=wd_mask))
    parts.append(core)
    parts.append(_scale_by_lr(learning_rate))
    return optax.chain(*parts)
