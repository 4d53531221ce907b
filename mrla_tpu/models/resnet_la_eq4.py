"""ResNet with LA eq. 4 (non-recurrent full layer attention) — the ablation
that recomputes K, V from the full stacked per-stage context each layer.

Behavioral parity with /root/reference/resnet/models/resnet_la_eq4.py:
  * block epilogue REPLACES the activation: out = BN(la(out, ctx))
    (:100-101 — no residual add around LA; the declared drop_path member is
    unused in forward, a reference quirk not replicated as behavior).
  * ctx is the stack of this stage's post-residual outputs [B, t, H, W, C],
    reset at each stage head (:207-239); dim_per_head=32 (:31).
  * 7x7 stem; factories resnet50/101_la_eq4 (:251-259).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu.models.common import (
    ClassifierHead,
    Downsample,
    Stem7x7,
    batch_norm,
    conv1x1,
    conv3x3,
)
from mrla_tpu.models.registry import register_model
from mrla_tpu.nn import ECALayer, SELayer
from mrla_tpu.nn.layers import _MRLAProjections, _resolve_heads
from mrla_tpu.ops import la_eq4_attention
from mrla_tpu.ops.common import max_pool_same_torch


class LAEq4Bottleneck(nn.Module):
    """Bottleneck whose output is replaced by stacked-context layer attention."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    se: bool = False
    eca_size: Optional[int] = None
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    zero_init_last_bn: bool = True
    dim_perhead: int = 32
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(
        self, x: jax.Array, mem: list[jax.Array], train: bool
    ) -> tuple[jax.Array, list[jax.Array]]:
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion

        out = conv1x1(width, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv3x3(
            width, self.stride, self.groups, self.dilation, self.dtype, name="conv2"
        )(out)
        out = batch_norm(train, self.dtype, name="bn2")(out)
        out = nn.relu(out)
        out = conv1x1(out_ch, dtype=self.dtype, name="conv3")(out)
        out = batch_norm(
            train, self.dtype, zero_init=self.zero_init_last_bn, name="bn3"
        )(out)

        if self.se:
            out = SELayer(name="se")(out)
        if self.eca_size is not None:
            out = ECALayer(k_size=self.eca_size, name="eca")(out)

        identity = x
        if self.use_downsample:
            identity = Downsample(out_ch, self.stride, self.dtype, name="downsample")(
                x, train
            )
        out = nn.relu(out + identity)

        mem = mem + [out]
        ctx = jnp.stack(mem, axis=1)  # [B, t, H, W, C]
        g = _resolve_heads(out_ch, None, self.dim_perhead)
        params = _MRLAProjections(name="la_proj")(out_ch)
        out = la_eq4_attention(out, ctx, params, g)
        out = batch_norm(train, self.dtype, name="bn_la")(out)
        return out, mem


class ResNetLAEq4(nn.Module):
    layers: Sequence[int]
    num_classes: int = 1000
    se: bool = False
    eca: Optional[Sequence[Optional[int]]] = None
    groups: int = 1
    width_per_group: int = 64
    drop_rate: float = 0.0
    dim_perhead: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        eca = self.eca or [None] * 4
        x = x.astype(self.dtype)
        x = Stem7x7(dtype=self.dtype, name="stem")(x, train)
        x = max_pool_same_torch(x, 3, 2)

        planes = 64
        for stage_idx, blocks in enumerate(self.layers):
            stride = 1 if stage_idx == 0 else 2
            mem: list[jax.Array] = []  # per-stage context reset
            for block_idx in range(blocks):
                first = block_idx == 0
                x, mem = LAEq4Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    use_downsample=first,
                    se=self.se,
                    eca_size=eca[stage_idx],
                    groups=self.groups,
                    base_width=self.width_per_group,
                    dim_perhead=self.dim_perhead,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, mem, train)
            planes *= 2

        return ClassifierHead(
            self.num_classes, self.drop_rate, self.dtype, name="head"
        )(x, train)


@register_model
def resnet50_la_eq4(**kw):
    return ResNetLAEq4(layers=[3, 4, 6, 3], **kw)


@register_model
def resnet101_la_eq4(**kw):
    return ResNetLAEq4(layers=[3, 4, 23, 3], **kw)
