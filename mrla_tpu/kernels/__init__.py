"""Pallas TPU kernels for the hot ops (the fusion targets of BASELINE.json)."""

from mrla_tpu.kernels.mrla_epilogue import (
    mrla_light_epilogue_pallas,
    mrla_light_epilogue_reference,
)

__all__ = ["mrla_light_epilogue_pallas", "mrla_light_epilogue_reference"]
