"""Train state: params + optimizer + BN batch_stats (+ optional EMA)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState extended with BN running stats and optional EMA.

    EMA covers BOTH params and batch_stats: timm's ModelEma (used by the
    reference, deit/main.py:297-304) deep-copies the whole module and decays
    every state_dict entry, running BN stats included — so EMA eval must use
    EMA batch_stats, not the raw ones.
    """

    batch_stats: Any = None
    ema_params: Optional[Any] = None
    ema_batch_stats: Optional[Any] = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)


def create_train_state(
    model,
    rng: jax.Array,
    sample_input,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.0,
    variables: Optional[Any] = None,
) -> TrainState:
    """Pass `variables` to reuse an init already computed (model.init of a
    full model traces the whole network — doing it twice doubles startup)."""
    if variables is None:
        variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    # EMA trees start equal to the live trees but must be DISTINCT buffers:
    # a donating jit (train/cli.py) rejects the same buffer appearing twice
    # in one argument list ("attempt to donate the same buffer twice").
    copy = lambda tree: jax.tree.map(lambda a: jnp.array(a), tree)
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        batch_stats=batch_stats,
        ema_params=copy(params) if ema_decay > 0 else None,
        ema_batch_stats=(
            copy(batch_stats) if (ema_decay > 0 and batch_stats) else None
        ),
        ema_decay=ema_decay,
    )
