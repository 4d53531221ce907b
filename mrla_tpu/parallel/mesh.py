"""Mesh + sharding helpers (data-parallel today; model axis reserved).

Equivalent reference functionality: mp.spawn/DDP/NCCL process-group setup
(resnet/train.py:127-154, deit/utils.py:216-238).  On TPU: one jit over a
Mesh; batch dim sharded over 'data'; params replicated (pure DP, matching
the reference's only strategy, SURVEY.md §2.4).  The 'model' axis exists so
tensor-parallel shardings can be layered in without re-plumbing callers.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axes: Sequence[str] = ("data", "model"),
    shape: Optional[Sequence[int]] = None,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a device mesh.  Default: all devices on 'data', 'model'=1."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if shape is None:
        shape = [n] + [1] * (len(axes) - 1)
    if int(np.prod(shape)) != n:
        raise ValueError(f"mesh shape {shape} != device count {n}")
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, axis_names=tuple(axes))


def local_mesh() -> Mesh:
    """Single-process mesh over whatever devices are visible."""
    return make_mesh()


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over 'data'; everything else replicated."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Shard a pytree of arrays with the batch dim split over 'data'.

    Single-process: a plain device_put of the global array.  Multi-host:
    each process passes its LOCAL shard (global_batch / process_count rows —
    the reference's per-rank DataLoader split, resnet/train.py:172-173,266)
    and the global jax.Array is assembled without any cross-host data
    movement via make_array_from_process_local_data.
    """
    if jax.process_count() == 1:
        return jax.tree.map(
            lambda x: jax.device_put(x, batch_sharding(mesh, np.ndim(x))), batch
        )
    return jax.tree.map(
        lambda x: jax.make_array_from_process_local_data(
            batch_sharding(mesh, np.ndim(x)), np.asarray(x)
        ),
        batch,
    )
