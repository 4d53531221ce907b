"""ResNet with MRLA-base (eq. 6): full cross-layer attention with a growing
per-stage K/V cache.

Behavioral parity with /root/reference/resnet/models/resnet_mrla_base.py:
  * deep 3-conv stem, stem_width 32 (:176-187); dim_perhead=16 (:33);
    optional channel_wise (dim_perhead=1, :35-38).
  * block epilogue: attn_t = mrla(out, K, V); out + DropPath(ReLU(BN(attn_t)))
    — note the ReLU on attn (:124-127) which the 'base22' variant drops.
  * init_cell=True at every stage head resets the cache (:192-195) because
    H, W, C change at stage boundaries.
  * The '22' variant (resnet_mrla_base22.py) differs by: standard 7x7 stem
    and no ReLU on attn (diff at :126,:174) — exposed as deep_stem=False,
    relu_on_attn=False.

TPU-first: the cache is threaded functionally through a Python loop over
blocks — t is static per call site, so jit sees a feed-forward graph with
static shapes (no masking needed; SURVEY.md §7 hard parts).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu.models.common import (
    ClassifierHead,
    DeepStem,
    Downsample,
    Stem7x7,
    batch_norm,
    conv1x1,
    conv3x3,
)
from mrla_tpu.models.registry import register_model
from mrla_tpu.nn import DropPath, ECALayer, MRLABaseModule, SELayer
from mrla_tpu.ops.common import max_pool_same_torch
from mrla_tpu.ops.mrla import MRLACache


class MRLABaseBottleneck(nn.Module):
    """Bottleneck + MRLA-base epilogue; threads the (K, V) cache."""

    planes: int
    stride: int = 1
    use_downsample: bool = False
    se: bool = False
    eca_size: Optional[int] = None
    groups: int = 1
    base_width: int = 64
    dilation: int = 1
    zero_init_last_bn: bool = True
    drop_path: float = 0.0
    dim_perhead: int = 16
    channel_wise: bool = False
    relu_on_attn: bool = True  # base22 variant: False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(
        self, x: jax.Array, cache: Optional[MRLACache], train: bool
    ) -> tuple[jax.Array, MRLACache]:
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

        attn_t, new_cache = MRLABaseModule(
            dim_perhead=self.dim_perhead, channel_wise=self.channel_wise, name="mrla"
        )(out, cache)
        attn_t = batch_norm(train, self.dtype, name="bn_mrla")(attn_t)
        if self.relu_on_attn:
            attn_t = nn.relu(attn_t)
        attn_t = DropPath(self.drop_path, name="drop_path")(attn_t, not train)
        return out + attn_t, new_cache


class MRLABaseScanBottleneck(nn.Module):
    """Non-first stage block in lax.scan form: carry = (x, k_buf, v_buf, t).

    Identical math to MRLABaseBottleneck (no downsample — stage-interior
    blocks never have one) against the fixed-size masked cache
    (ops.mrla.mrla_base_attention_fixed).  Scanning keeps compile time O(1)
    in stage depth — the SURVEY.md §7 hard case (resnet101 stage 3 = 23
    blocks of [B,14,14,1024] V maps).
    """

    planes: int
    se: bool = False
    eca_size: Optional[int] = None
    groups: int = 1
    base_width: int = 64
    zero_init_last_bn: bool = True
    drop_path: float = 0.0
    dim_perhead: int = 16
    channel_wise: bool = False
    relu_on_attn: bool = True
    train: bool = False
    dtype: Any = jnp.float32
    expansion: int = 4

    @nn.compact
    def __call__(self, carry, _):
        from mrla_tpu.nn.layers import _MRLAProjections, _resolve_heads
        from mrla_tpu.ops.mrla import mrla_base_attention_fixed

        x, k_buf, v_buf, t = carry
        train = self.train
        width = int(self.planes * (self.base_width / 64.0)) * self.groups
        out_ch = self.planes * self.expansion

        out = conv1x1(width, dtype=self.dtype, name="conv1")(x)
        out = batch_norm(train, self.dtype, name="bn1")(out)
        out = nn.relu(out)
        out = conv3x3(width, 1, self.groups, 1, self.dtype, name="conv2")(out)
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
        out = nn.relu(out + x)

        dph = 1 if self.channel_wise else self.dim_perhead
        g = _resolve_heads(out_ch, None, dph)
        # param path matches MRLABaseModule->MRLABaseLayer nesting so the
        # torch converter layout applies after stacking: mrla/mrla/proj/*
        params = _MRLAProjections(name="mrla_proj_scan")(out_ch)
        attn_t, k_buf, v_buf = mrla_base_attention_fixed(
            out, params, g, k_buf, v_buf, t
        )
        attn_t = batch_norm(train, self.dtype, name="bn_mrla")(attn_t)
        if self.relu_on_attn:
            attn_t = nn.relu(attn_t)
        attn_t = DropPath(self.drop_path, name="drop_path")(attn_t, not train)
        return (out + attn_t, k_buf, v_buf, t + 1), None


class ResNetMRLABase(nn.Module):
    """ResNet_mrlab container: cache reset per stage (init_cell semantics)."""

    layers: Sequence[int]
    num_classes: int = 1000
    se: bool = False
    eca: Optional[Sequence[Optional[int]]] = None
    groups: int = 1
    width_per_group: int = 64
    drop_rate: float = 0.0
    drop_path: float = 0.0
    dim_perhead: int = 16
    channel_wise: bool = False
    deep_stem: bool = True  # base22 variant: False (7x7 stem)
    relu_on_attn: bool = True  # base22 variant: False
    use_scan: bool = False  # lax.scan stages: O(1) compile in depth
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        eca = self.eca or [None] * 4
        x = x.astype(self.dtype)
        if self.deep_stem:
            x = DeepStem(dtype=self.dtype, name="stem")(x, train)
        else:
            x = Stem7x7(dtype=self.dtype, name="stem")(x, train)
        x = max_pool_same_torch(x, 3, 2)

        planes = 64
        for stage_idx, blocks in enumerate(self.layers):
            stride = 1 if stage_idx == 0 else 2
            # first block: downsample + init_cell (always unrolled)
            x, cache = MRLABaseBottleneck(
                planes=planes,
                stride=stride,
                use_downsample=True,
                se=self.se,
                eca_size=eca[stage_idx],
                groups=self.groups,
                base_width=self.width_per_group,
                drop_path=self.drop_path,
                dim_perhead=self.dim_perhead,
                channel_wise=self.channel_wise,
                relu_on_attn=self.relu_on_attn,
                dtype=self.dtype,
                name=f"layer{stage_idx + 1}_0",
            )(x, None, train)

            if self.use_scan and blocks > 1:
                # fixed-size masked cache + one scanned block body
                b, h, w, c = x.shape
                k_buf = jnp.zeros((b, blocks, c), cache.k.dtype)
                v_buf = jnp.zeros((b, blocks, h, w, c), cache.v.dtype)
                k_buf = k_buf.at[:, :1].set(cache.k)
                v_buf = v_buf.at[:, :1].set(cache.v)
                scanned = nn.scan(
                    MRLABaseScanBottleneck,
                    variable_axes={"params": 0, "batch_stats": 0},
                    variable_broadcast=False,
                    split_rngs={"params": True, "droppath": True},
                    length=blocks - 1,
                )(
                    planes=planes,
                    se=self.se,
                    eca_size=eca[stage_idx],
                    groups=self.groups,
                    base_width=self.width_per_group,
                    drop_path=self.drop_path,
                    dim_perhead=self.dim_perhead,
                    channel_wise=self.channel_wise,
                    relu_on_attn=self.relu_on_attn,
                    train=train,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_scan",
                )
                (x, _, _, _), _ = scanned(
                    (x, k_buf, v_buf, jnp.int32(1)), None
                )
            else:
                for block_idx in range(1, blocks):
                    x, cache = MRLABaseBottleneck(
                        planes=planes,
                        stride=1,
                        use_downsample=False,
                        se=self.se,
                        eca_size=eca[stage_idx],
                        groups=self.groups,
                        base_width=self.width_per_group,
                        drop_path=self.drop_path,
                        dim_perhead=self.dim_perhead,
                        channel_wise=self.channel_wise,
                        relu_on_attn=self.relu_on_attn,
                        dtype=self.dtype,
                        name=f"layer{stage_idx + 1}_{block_idx}",
                    )(x, cache, train)
            planes *= 2

        return ClassifierHead(
            self.num_classes, self.drop_rate, self.dtype, name="head"
        )(x, train)


@register_model
def resnet50_mrlab(**kw):
    return ResNetMRLABase(layers=[3, 4, 6, 3], **kw)


@register_model
def resnet101_mrlab(**kw):
    return ResNetMRLABase(layers=[3, 4, 23, 3], **kw)


@register_model
def resnet152_mrlab(**kw):
    """Exported in the reference __all__ (resnet_mrla_base.py:17); defined here."""
    return ResNetMRLABase(layers=[3, 8, 36, 3], **kw)


@register_model
def resnet50_mrlab22(**kw):
    """The 'base22' ablation: 7x7 stem, no ReLU on attn (resnet_mrla_base22.py)."""
    return ResNetMRLABase(
        layers=[3, 4, 6, 3], deep_stem=False, relu_on_attn=False, **kw
    )
