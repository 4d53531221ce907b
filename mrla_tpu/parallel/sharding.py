"""Parameter sharding rules for the 'model' mesh axis (tensor parallelism).

The reference implements only data parallelism (SURVEY.md §2.4); the mesh
here reserves a 'model' axis so large kernels can shard across chips for
serving/fine-tuning bigger variants.  Rule: shard the OUTPUT-channel (last)
dim of every kernel whose last dim divides the axis size and whose size
clears a threshold; everything else (biases, norms, λ, 1-D taps) replicates.
GSPMD inserts the all-gathers/reduce-scatters where a consumer needs the
full channel axis (GAP, head reshapes) — no manual collectives.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_shardings(
    tree: Any,
    mesh: Mesh,
    axis: str = "model",
    min_elements: int = 1 << 16,
) -> Any:
    """Sharding pytree for any param-shaped tree (params, momenta, EMA)."""
    size = mesh.shape[axis]

    def rule(x):
        shape = np.shape(x)
        if (
            size > 1
            and len(shape) >= 2
            and shape[-1] % size == 0
            and int(np.prod(shape)) >= min_elements
        ):
            spec = P(*([None] * (len(shape) - 1) + [axis]))
        else:
            spec = P()
        return NamedSharding(mesh, spec)

    return jax.tree.map(rule, tree)


def shard_train_state(state: Any, mesh: Mesh, axis: str = "model") -> Any:
    """device_put a TrainState with TP rules on every param-shaped leaf
    (params, optimizer momenta, EMA) and replication elsewhere."""
    shardings = tp_shardings(state, mesh, axis=axis)
    return jax.device_put(state, shardings)
