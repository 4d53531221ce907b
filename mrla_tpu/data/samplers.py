"""Index samplers (numpy, host side).

  * distributed_indices — torch DistributedSampler semantics used by
    resnet/train.py:266: per-epoch seeded shuffle, pad to a multiple of
    world_size, rank-strided slice.
  * ra_sampler_indices — deit/samplers.py:8-64 RASampler: each index
    repeated 3x, shuffled, padded, rank-strided, then truncated to
    num_selected = floor(len(dataset) / 256) * 256 / world_size (:35,:58).
"""

from __future__ import annotations

import math

import numpy as np


def distributed_indices(
    n: int, rank: int, world_size: int, epoch: int, shuffle: bool = True, seed: int = 0
) -> np.ndarray:
    if n == 0:
        return np.arange(0)
    if shuffle:
        g = np.random.default_rng(seed + epoch)
        order = g.permutation(n)
    else:
        order = np.arange(n)
    total = int(math.ceil(n / world_size)) * world_size
    # torch DistributedSampler repeats the whole index list as many times
    # as padding needs — order[:total-n] under-pads when total-n > n
    # (dataset smaller than world_size), giving ranks RAGGED shard sizes
    # and a collective hang in SPMD training
    reps = int(math.ceil(total / n))
    order = np.tile(order, reps)[:total]
    return order[rank:total:world_size]


def ra_sampler_indices(
    n: int,
    rank: int,
    world_size: int,
    epoch: int,
    num_repeats: int = 3,
    seed: int = 0,
) -> np.ndarray:
    if n == 0:
        return np.arange(0)
    g = np.random.default_rng(seed + epoch)
    order = g.permutation(n)
    repeated = np.repeat(order, num_repeats)
    total = int(math.ceil(len(repeated) / world_size)) * world_size
    reps = int(math.ceil(total / len(repeated)))
    repeated = np.tile(repeated, reps)[:total]  # same tiling as above
    sel = repeated[rank:total:world_size]
    # deit/samplers.py:35: floor(len(dataset) // 256 * 256 / num_replicas) —
    # integer-truncate to a 256 multiple FIRST, then split across ranks.
    num_selected = int(math.floor(n // 256 * 256 / world_size))
    return sel[:num_selected]
