"""ResNet with the MRLA-light epilogue (the flagship family).

Behavioral parity with /root/reference/resnet/models/resnet_mrla_light.py:
  * block: bottleneck -> (+identity, relu) -> out + DropPath(BN(mrla(out) + λ·identity))
    (reference :113-116), with dim_perhead=32 (:33) and λ ~ N(0,1) (:38).
  * 7x7 stem (:162-165); zero-init bn3 (:184-188).
  * ``features_only=True`` reproduces the MMDetection backbone contract —
    a (C2, C3, C4, C5) pyramid tuple with NO DropPath in the epilogue
    (mmdetection/.../resnet_mrlal.py:86,116,276-296).

Also defines resnet152_mrlal, which the reference exports in __all__ but
never defines (latent ImportError, SURVEY.md §2.7) — fixed here.
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
from mrla_tpu.nn import DropPath, ECALayer, MRLALightModule, SELayer
from mrla_tpu.ops.common import max_pool_same_torch


class _FusedBNEpilogue(nn.Module):
    """Owns bn_mrla's params/stats (nn.BatchNorm-compatible names) and runs
    the fused custom-VJP train tail; used only in train mode with DropPath
    inactive (rate 0 — the published ResNet recipe)."""

    momentum: float = 0.9  # torch running-stat decay 0.1 (common.batch_norm)

    @nn.compact
    def __call__(self, out, identity, proj, lam, heads):
        from mrla_tpu.ops.fused_train import fused_light_epilogue_train

        c = out.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        ret, mean, var = fused_light_epilogue_train(
            out, identity, proj.wq, proj.wk, proj.wv, lam, scale, bias,
            heads,
        )
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return ret


class MRLABottleneck(nn.Module):
    """Bottleneck + MRLA-light epilogue."""

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
    use_drop_path: bool = True  # mmdet backbone variant omits DropPath
    dim_perhead: int = 32
    fused_epilogue: bool = False  # train-mode custom-VJP tail (ops/fused_train.py)
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

        # MRLA-light epilogue: the recurrence input o_{t-1} is this block's
        # (downsampled) identity — reference resnet_mrla_light.py:116.
        mrla_mod = MRLALightModule(dim_perhead=self.dim_perhead, name="mrla")
        droppath_active = self.use_drop_path and self.drop_path > 0.0
        if self.fused_epilogue and train and not droppath_active:
            # one custom-VJP op for the whole tail (mrla + bn_mrla + add);
            # same param tree, measured verdict in ROADMAP.md
            proj, lam, g = mrla_mod(out, identity, params_only=True)
            return _FusedBNEpilogue(name="bn_mrla")(out, identity, proj,
                                                    lam, g)
        mrla_out = mrla_mod(out, identity)
        mrla_out = batch_norm(train, self.dtype, name="bn_mrla")(mrla_out)
        if self.use_drop_path:
            mrla_out = DropPath(self.drop_path, name="drop_path")(mrla_out, not train)
        return out + mrla_out


class ResNetMRLALight(nn.Module):
    """ResNet_mrlal: classification head or (C2..C5) feature-pyramid export."""

    layers: Sequence[int]
    num_classes: int = 1000
    se: bool = False
    eca: Optional[Sequence[Optional[int]]] = None
    groups: int = 1
    width_per_group: int = 64
    drop_rate: float = 0.0
    drop_path: float = 0.0
    dim_perhead: int = 32
    features_only: bool = False  # MMDetection backbone contract
    use_drop_path: bool = True
    remat: bool = False  # rematerialize each block in backward (training)
    fused_epilogue: bool = False  # custom-VJP train tail (ops/fused_train.py)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        eca = self.eca or [None] * 4
        x = x.astype(self.dtype)
        x = Stem7x7(dtype=self.dtype, name="stem")(x, train)
        x = max_pool_same_torch(x, 3, 2)

        block_cls = (
            nn.remat(MRLABottleneck, static_argnums=(2,))
            if self.remat
            else MRLABottleneck
        )
        outs = []
        planes = 64
        for stage_idx, blocks in enumerate(self.layers):
            stride = 1 if stage_idx == 0 else 2
            for block_idx in range(blocks):
                first = block_idx == 0
                x = block_cls(
                    planes=planes,
                    stride=stride if first else 1,
                    use_downsample=first,
                    se=self.se,
                    eca_size=eca[stage_idx],
                    groups=self.groups,
                    base_width=self.width_per_group,
                    drop_path=self.drop_path,
                    use_drop_path=self.use_drop_path,
                    dim_perhead=self.dim_perhead,
                    fused_epilogue=self.fused_epilogue,
                    dtype=self.dtype,
                    name=f"layer{stage_idx + 1}_{block_idx}",
                )(x, train)
            outs.append(x)
            planes *= 2

        if self.features_only:
            return tuple(outs)
        return ClassifierHead(
            self.num_classes, self.drop_rate, self.dtype, name="head"
        )(x, train)


@register_model
def resnet50_mrlal(**kw):
    return ResNetMRLALight(layers=[3, 4, 6, 3], **kw)


@register_model
def resnet101_mrlal(**kw):
    return ResNetMRLALight(layers=[3, 4, 23, 3], **kw)


@register_model
def resnet152_mrlal(**kw):
    """Declared-but-undefined in the reference (resnet_mrla_light.py:17); defined here."""
    return ResNetMRLALight(layers=[3, 8, 36, 3], **kw)
