"""Orbax checkpointing with the reference's logical content.

Reference contract (SURVEY.md §5.4): per-epoch save of {epoch, model,
best_acc1, optimizer} with a separate best copy (resnet/train.py:331-353,
486-493); DeiT adds lr-scheduler/EMA/scaler state (deit/main.py:392-422).
Here the whole TrainState (params, opt_state, batch_stats, ema) plus
metadata round-trips through one orbax PyTreeCheckpointer; `keep_best`
mirrors the model_best.pth.tar copy.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(path)


def save_checkpoint(
    directory: str,
    state: Any,
    epoch: int,
    best_acc1: float = 0.0,
    is_best: bool = False,
    keep_every: int = 0,
) -> None:
    ckpt = {
        "state": state,
        "meta": {"epoch": epoch, "best_acc1": float(best_acc1)},
    }
    ckptr = ocp.PyTreeCheckpointer()
    ckptr.save(os.path.join(_abs(directory), "checkpoint"), ckpt, force=True)
    if is_best:
        ckptr.save(os.path.join(_abs(directory), "best"), ckpt, force=True)
    if keep_every and epoch % keep_every == 0:
        ckptr.save(os.path.join(_abs(directory), f"epoch_{epoch}"), ckpt, force=True)


def restore_checkpoint(
    directory: str, state_template: Any = None, name: str = "checkpoint"
) -> Optional[tuple[Any, int, float]]:
    """Restore (state, epoch, best_acc1); None if absent.

    With state_template=None the checkpoint is restored as raw nested
    dicts (a TrainState comes back keyed by its field names: 'params',
    'batch_stats', ...) — the form the serving CLI consumes; pass the live
    TrainState template to get a typed restore for training resume."""
    path = os.path.join(_abs(directory), name)
    if not os.path.exists(path):
        return None
    ckptr = ocp.PyTreeCheckpointer()
    if state_template is None:
        restored = ckptr.restore(path)
    else:
        template = {
            "state": state_template, "meta": {"epoch": 0, "best_acc1": 0.0}
        }
        restored = ckptr.restore(path, item=template)
    meta = restored["meta"]
    return restored["state"], int(meta["epoch"]), float(meta["best_acc1"])
