"""Pallas TPU kernels for the hot ops (the fusion targets of BASELINE.json)."""

from mrla_tpu.kernels.mrla_epilogue import (
    mrla_light_epilogue_pallas,
    mrla_light_epilogue_reference,
    mrla_light_gate,
)
from mrla_tpu.kernels.mrla_megatail import mrla_block_tail_fused_next

__all__ = [
    "mrla_block_tail_fused_next",
    "mrla_light_epilogue_pallas",
    "mrla_light_epilogue_reference",
    "mrla_light_gate",
]
