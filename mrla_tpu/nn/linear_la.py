"""Flax wrappers for the linear layer-attention family.

Module parity with /root/reference/resnet/models/modules/linear_la.py
(LinearLayerAttention :12-105, linear_cla :109-181, linear_gla :184-269)
and feature_map.py (the φ interface; elu(x)+1 default).  The running state
(s, z) threads functionally through the caller, like the MRLA-base cache.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
from flax import linen as nn

from mrla_tpu.nn.layers import _MRLAProjections
from mrla_tpu.ops.linear_la import (
    elu_feature_map,
    linear_cla_step,
    linear_gla_step,
    linear_la_step,
)

# φ registry (FeatureMap interface equivalent — a function is the interface)
FEATURE_MAPS: dict[str, Callable] = {
    "elu": elu_feature_map,
}


class LinearLayerAttention(nn.Module):
    """Full-rank linear LA: s [B,C,CHW] running KV summary.

    svd=True carries the state factorized (reference linear_la.py:86-105);
    svd_rank truncates it to a rank-k compression.
    """

    feature_map: str = "elu"
    eps: float = 1e-6
    k_size: Optional[int] = None
    svd: bool = False
    svd_rank: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, s, z):
        params = _MRLAProjections(self.k_size, name="proj")(x.shape[-1])
        return linear_la_step(
            x, s, z, params, phi=FEATURE_MAPS[self.feature_map], eps=self.eps,
            svd=self.svd, svd_rank=self.svd_rank,
        )


class LinearCLA(nn.Module):
    """Channel-wise linear LA (one head per channel)."""

    feature_map: str = "elu"
    eps: float = 1e-6
    k_size: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, s, z):
        params = _MRLAProjections(self.k_size, name="proj")(x.shape[-1])
        return linear_cla_step(
            x, s, z, params, phi=FEATURE_MAPS[self.feature_map], eps=self.eps
        )


class LinearGLA(nn.Module):
    """Group-wise linear LA."""

    groups: Optional[int] = None
    dim_pergroup: Optional[int] = None
    feature_map: str = "elu"
    eps: float = 1e-6
    k_size: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array, s, z):
        c = x.shape[-1]
        if self.groups is None and self.dim_pergroup is None:
            raise ValueError("one of groups / dim_pergroup must be given")
        g = self.groups if self.groups is not None else c // self.dim_pergroup
        params = _MRLAProjections(self.k_size, name="proj")(c)
        return linear_gla_step(
            x, s, z, params, groups=g, phi=FEATURE_MAPS[self.feature_map],
            eps=self.eps,
        )
