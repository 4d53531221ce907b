"""Utilities: FLOPs/params accounting, fine-tune surgery, profiling hooks."""

from mrla_tpu.utils.flops import count_params, count_flops, profile_model
from mrla_tpu.utils.finetune import interpolate_pos_embed, reset_classifier

__all__ = [
    "count_params",
    "count_flops",
    "profile_model",
    "interpolate_pos_embed",
    "reset_classifier",
]
