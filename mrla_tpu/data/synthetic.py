"""Synthetic data source (shape-compatible stand-in for ImageNet).

Two modes:
  * noise (default): random images + random labels — exercises shapes and
    throughput, nothing learnable.
  * learnable: each class is a fixed random spatial template plus
    per-sample noise — a working trainer must drive loss well below
    ln(num_classes); a broken gradient path / BN wiring / optimizer cannot.
    Used by the on-chip training smokes (scripts/train_smoke*_tpu.py) and
    `--data synthetic-learnable` in the CLI.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Iterator

import numpy as np


@lru_cache(maxsize=4)
def _templates(num_classes: int, image_size: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (
        rng.standard_normal((num_classes, image_size, image_size, 3)) * 0.5
    ).astype(np.float32)


def synthetic_batches(
    batch_size: int,
    image_size: int = 224,
    num_classes: int = 1000,
    steps: int = 10,
    seed: int = 0,
    learnable: bool = False,
    noise: float = 0.5,
    template_seed: int = 0,
) -> Iterator[dict]:
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        labels = rng.integers(0, num_classes, batch_size).astype(np.int32)
        if learnable:
            t = _templates(num_classes, image_size, template_seed)
            images = t[labels] + rng.standard_normal(
                (batch_size, image_size, image_size, 3)
            ).astype(np.float32) * noise
        else:
            images = rng.standard_normal(
                (batch_size, image_size, image_size, 3)
            ).astype(np.float32)
        yield {"image": images, "label": labels}
