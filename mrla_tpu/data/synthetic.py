"""Synthetic data source (shape-compatible stand-in for ImageNet)."""

from __future__ import annotations

from typing import Iterator

import numpy as np


def synthetic_batches(
    batch_size: int,
    image_size: int = 224,
    num_classes: int = 1000,
    steps: int = 10,
    seed: int = 0,
) -> Iterator[dict]:
    rng = np.random.default_rng(seed)
    for _ in range(steps):
        yield {
            "image": rng.standard_normal(
                (batch_size, image_size, image_size, 3)
            ).astype(np.float32),
            "label": rng.integers(0, num_classes, batch_size).astype(np.int32),
        }
