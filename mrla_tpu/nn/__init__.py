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

__all__ = [
    "MRLALightLayer",
    "MRLALightModule",
    "MRLABaseLayer",
    "MRLABaseModule",
    "SELayer",
    "ECALayer",
    "DropPath",
]
