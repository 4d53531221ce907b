"""Checkpointing: orbax save/restore + one-way PyTorch -> Flax conversion."""

from mrla_tpu.ckpt.detect_convert import convert_mmdet_state_dict
from mrla_tpu.ckpt.orbax_io import restore_checkpoint, save_checkpoint
from mrla_tpu.ckpt.torch_convert import (
    convert_mrla_base_state_dict,
    convert_resnet_state_dict,
    convert_vit_state_dict,
)

__all__ = [
    "convert_mmdet_state_dict",
    "convert_mrla_base_state_dict",
    "convert_resnet_state_dict",
    "convert_vit_state_dict",
    "restore_checkpoint",
    "save_checkpoint",
]
