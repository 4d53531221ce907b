"""Baseline ResNet / ResNeXt family with optional SE/ECA gates, plus the
depthwise-conv ablation (resnet_dw).

Capability parity with /root/reference/resnet/models/resnet.py:39-353 and
resnet_dw.py — every registered arch name is reproduced.  TPU-first: NHWC,
compute dtype configurable (bf16 on TPU), BN in fp32 params.
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
from mrla_tpu.nn import DropPath, ECALayer, SELayer
from mrla_tpu.ops.common import max_pool_same_torch


class Bottleneck(nn.Module):
    """Standard bottleneck: 1x1 -> 3x3(stride) -> 1x1 + optional SE/ECA gate."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    se: bool = False
    eca_size: Optional[int] = None
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    zero_init_last_bn: bool = True
    dw_epilogue: bool = False  # resnet_dw ablation: + DropPath(BN(DWConv(out)))
    drop_path: float = 0.0
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
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

        if self.dw_epilogue:
            # resnet_dw ablation (reference resnet_dw.py:87): isolates the
            # depthwise-conv contribution of the MRLA epilogue.
            c = out.shape[-1]
            dw = nn.Conv(
                c,
                kernel_size=(3, 3),
                padding=((1, 1), (1, 1)),
                feature_group_count=c,
                use_bias=False,
                kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                dtype=self.dtype,
                name="dwconv",
            )(out)
            dw = batch_norm(train, self.dtype, name="bn_dw")(dw)
            out = out + DropPath(self.drop_path, name="drop_path")(dw, not train)
        return out


class ResNet(nn.Module):
    """Baseline ResNet container (stages of Bottleneck blocks)."""

    layers: Sequence[int]
    num_classes: int = 1000
    se: bool = False
    eca: Optional[Sequence[Optional[int]]] = None
    groups: int = 1
    width_per_group: int = 64
    drop_rate: float = 0.0
    drop_path: float = 0.0
    dw_epilogue: bool = False
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
            for block_idx in range(blocks):
                first = block_idx == 0
                x = Bottleneck(
                    planes=planes,
                    stride=stride if first else 1,
                    use_downsample=first,
                    se=self.se,
                    eca_size=eca[stage_idx],
                    groups=self.groups,
                    base_width=self.width_per_group,
                    drop_path=self.drop_path,
                    dw_epilogue=self.dw_epilogue,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
            planes *= 2

        return ClassifierHead(
            self.num_classes, self.drop_rate, self.dtype, name="head"
        )(x, train)


def _resnet(layers, **kwargs):
    return ResNet(layers=layers, **kwargs)


# --- registered arch names (parity with reference resnet.py:212-352) ---

@register_model
def resnet50(**kw):
    return _resnet([3, 4, 6, 3], **kw)


@register_model
def resnet101(**kw):
    return _resnet([3, 4, 23, 3], **kw)


@register_model
def resnet152(**kw):
    return _resnet([3, 8, 36, 3], **kw)


@register_model
def resnet50_se(**kw):
    return _resnet([3, 4, 6, 3], se=True, **kw)


@register_model
def resnet101_se(**kw):
    return _resnet([3, 4, 23, 3], se=True, **kw)


@register_model
def resnet152_se(**kw):
    return _resnet([3, 8, 36, 3], se=True, **kw)


# reference resnet.py:231 default: k_size=[5, 5, 5, 7]
_ECA_DEFAULT = (5, 5, 5, 7)


@register_model
def resnet50_eca(**kw):
    return _resnet([3, 4, 6, 3], eca=_ECA_DEFAULT, **kw)


@register_model
def resnet101_eca(**kw):
    return _resnet([3, 4, 23, 3], eca=_ECA_DEFAULT, **kw)


@register_model
def resnet152_eca(**kw):
    return _resnet([3, 8, 36, 3], eca=_ECA_DEFAULT, **kw)


@register_model
def resnext50_32x4d(**kw):
    return _resnet([3, 4, 6, 3], groups=32, width_per_group=4, **kw)


@register_model
def resnext50_32x4d_se(**kw):
    return _resnet([3, 4, 6, 3], groups=32, width_per_group=4, se=True, **kw)


@register_model
def resnext50_32x4d_eca(**kw):
    return _resnet([3, 4, 6, 3], groups=32, width_per_group=4, eca=_ECA_DEFAULT, **kw)


@register_model
def resnext101_32x4d(**kw):
    return _resnet([3, 4, 23, 3], groups=32, width_per_group=4, **kw)


@register_model
def resnext101_32x4d_se(**kw):
    return _resnet([3, 4, 23, 3], groups=32, width_per_group=4, se=True, **kw)


@register_model
def resnext101_32x4d_eca(**kw):
    return _resnet([3, 4, 23, 3], groups=32, width_per_group=4, eca=_ECA_DEFAULT, **kw)


@register_model
def resnet50_dw(**kw):
    """Depthwise-epilogue ablation (reference resnet_dw.py:207-215)."""
    return _resnet([3, 4, 6, 3], dw_epilogue=True, **kw)
