"""Flax module wrappers over mrla_tpu.ops (parameterized L0 layers)."""

from mrla_tpu.nn.layers import (
    MRLALightLayer,
    MRLALightModule,
    MRLABaseLayer,
    MRLABaseModule,
    SELayer,
    ECALayer,
    DropPath,
)
from mrla_tpu.nn.linear_la import LinearLayerAttention, LinearCLA, LinearGLA

# The reference's mla_layer (mla_module.py) is byte-equivalent math to
# mrla_light_layer without the λ recurrence wrapper — same module here.
MLALayer = MRLALightLayer

__all__ = [
    "MRLALightLayer",
    "MRLALightModule",
    "MRLABaseLayer",
    "MRLABaseModule",
    "MLALayer",
    "SELayer",
    "ECALayer",
    "DropPath",
    "LinearLayerAttention",
    "LinearCLA",
    "LinearGLA",
]
