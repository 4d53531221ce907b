"""Checkpointing: orbax save/restore + one-way PyTorch -> Flax conversion."""

from mrla_tpu.ckpt.torch_convert import convert_resnet_state_dict

__all__ = ["convert_resnet_state_dict"]
