"""Unified trainer (replaces the reference's three harness silos, SURVEY.md §2.3)."""

from mrla_tpu.train.losses import cross_entropy, label_smoothing_ce, soft_target_ce
from mrla_tpu.train.state import TrainState, create_train_state
from mrla_tpu.train.steps import make_train_step, make_eval_step

__all__ = [
    "cross_entropy",
    "label_smoothing_ce",
    "soft_target_ce",
    "TrainState",
    "create_train_state",
    "make_train_step",
    "make_eval_step",
]
