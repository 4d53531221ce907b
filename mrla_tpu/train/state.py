"""Train state: params + optimizer + BN batch_stats (+ optional EMA)."""

from __future__ import annotations

from typing import Any, Optional

import jax
import optax
from flax import struct
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState extended with BN running stats and optional EMA params."""

    batch_stats: Any = None
    ema_params: Optional[Any] = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)


def create_train_state(
    model,
    rng: jax.Array,
    sample_input,
    tx: optax.GradientTransformation,
    ema_decay: float = 0.0,
) -> TrainState:
    variables = model.init(rng, sample_input, train=False)
    params = variables["params"]
    return TrainState.create(
        apply_fn=model.apply,
        params=params,
        tx=tx,
        batch_stats=variables.get("batch_stats", {}),
        ema_params=params if ema_decay > 0 else None,
        ema_decay=ema_decay,
    )
