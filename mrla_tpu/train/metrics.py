"""Metric meters + reference-compatible log artifacts.

Reproduces both observability styles (SURVEY.md §5.5):
  * AverageMeter / per-epoch txt files — resnet/train.py:371-372,585-600
    (`data_save` appends "epoch value" lines, one file per metric).
  * MetricLogger with JSON-lines log — deit/utils.py:115-159 +
    deit/main.py:434-436 (one JSON object per epoch in log.txt).

Cross-rank sync (deit/utils.py:36-47 all_reduce) is a jax.process_allgather
/ pmean at the call site; meters here are host-side scalars.
"""

from __future__ import annotations

import json
import os
import time
from collections import defaultdict, deque
from typing import Optional


class AverageMeter:
    """Running average (same contract as the reference's meter)."""

    def __init__(self, name: str = "", fmt: str = ":f"):
        self.name, self.fmt = name, fmt
        self.reset()

    def reset(self):
        self.val = 0.0
        self.sum = 0.0
        self.count = 0

    def update(self, val: float, n: int = 1):
        self.val = float(val)
        self.sum += float(val) * n
        self.count += n

    @property
    def avg(self) -> float:
        return self.sum / max(self.count, 1)

    def __str__(self):
        return f"{self.name} {self.val:{self.fmt[1:]}} ({self.avg:{self.fmt[1:]}})"


class SmoothedValue:
    """Window-smoothed meter (deit/utils.py:20-66 semantics, minus dist sync)."""

    def __init__(self, window_size: int = 20):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value: float, n: int = 1):
        self.deque.append(float(value))
        self.count += n
        self.total += float(value) * n

    @property
    def median(self) -> float:
        d = sorted(self.deque)
        return d[len(d) // 2] if d else 0.0

    @property
    def avg(self) -> float:
        return sum(self.deque) / max(len(self.deque), 1)

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)


class MetricLogger:
    def __init__(self, delimiter: str = "  "):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __str__(self):
        return self.delimiter.join(
            f"{k}: {m.median:.4f} ({m.global_avg:.4f})" for k, m in self.meters.items()
        )

    def log_every(self, iterable, print_freq: int, header: str = ""):
        start = time.time()
        iter_time = SmoothedValue()
        last = time.time()
        for i, obj in enumerate(iterable):
            yield obj
            iter_time.update(time.time() - last)
            last = time.time()
            if i % print_freq == 0:
                print(f"{header} [{i}]  {self}  time: {iter_time.avg:.4f}s")
        print(f"{header} Total time: {time.time() - start:.1f}s")


def data_save(root: str, name: str, epoch: int, value: float) -> None:
    """Append 'epoch value' to <root>/<name>.txt (reference artifact format)."""
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, f"{name}.txt"), "a") as f:
        f.write(f"{epoch} {value}\n")


def jsonl_log(path: str, record: dict) -> None:
    """Append one JSON object per line (deit log.txt format)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def read_best(path: str, column: int = 1) -> Optional[tuple[int, float]]:
    """Post-hoc best-epoch extraction (resnet/best.py capability)."""
    if not os.path.exists(path):
        return None
    best: Optional[tuple[int, float]] = None
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) <= column:
                continue
            epoch, val = int(parts[0]), float(parts[column])
            if best is None or val > best[1]:
                best = (epoch, val)
    return best
