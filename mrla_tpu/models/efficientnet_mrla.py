"""EfficientNet-B0 with MRLA-light — re-derived.

The reference README trains `efficientnet_mrlal_b0` via timm
(/root/reference/README.md:94-103: "EfficientNet-B0 ... RMSpropTF lr .048,
decay .97/2.4ep, AMP, rand-m9-mstd0.5"), but the timm model source folder is
ABSENT from the snapshot (SURVEY.md §0) — so this file re-derives the model
from the standard MBConv+SE B0 recipe plus the MRLA-light epilogue semantics
of the resnet family (resnet_mrla_light.py:113-116):

    out = out + BN(mrla_light(out) + λ ⊙ identity)

applied to every residual-capable MBConv block (stride 1, in_ch == out_ch),
which is the direct analogue of the resnet placement.  dim_perhead=8 (B0
channel widths 16..320 are all divisible by 8).  BN eps 1e-3 (TF-ported
EfficientNet convention); SiLU activations; stochastic depth on the MBConv
residual; dropout 0.2 before the classifier.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu.models.registry import register_model
from mrla_tpu.nn import DropPath, MRLALightModule

KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

# (expand_ratio, out_channels, repeats, stride, kernel)
B0_BLOCKS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)


def _bn(train, dtype, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, epsilon=1e-3, dtype=dtype,
        name=name,
    )


class SqueezeExcite(nn.Module):
    """EfficientNet-style SE: reduce relative to the block INPUT channels."""

    reduce_ch: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        y = jnp.mean(x.astype(jnp.float32), axis=(1, 2))
        y = nn.Dense(self.reduce_ch, dtype=jnp.float32, name="fc1")(y)
        y = jax.nn.silu(y)
        y = nn.Dense(c, dtype=jnp.float32, name="fc2")(y)
        y = jax.nn.sigmoid(y)
        return x * y[:, None, None, :].astype(x.dtype)


class MBConv(nn.Module):
    """Mobile inverted bottleneck + SE + optional MRLA-light epilogue."""

    out_ch: int
    expand: int
    stride: int
    kernel: int
    drop_path: float = 0.0
    use_mrla: bool = False
    mrla_dim_perhead: int = 8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        in_ch = x.shape[-1]
        mid = in_ch * self.expand
        residual = self.stride == 1 and in_ch == self.out_ch
        h = x

        if self.expand != 1:
            h = nn.Conv(mid, (1, 1), use_bias=False, kernel_init=KAIMING_OUT,
                        dtype=self.dtype, name="expand_conv")(h)
            h = _bn(train, self.dtype, "bn0")(h)
            h = jax.nn.silu(h)

        k = self.kernel
        h = nn.Conv(
            mid, (k, k), strides=(self.stride, self.stride),
            padding=((k // 2, k // 2), (k // 2, k // 2)),
            feature_group_count=mid, use_bias=False, kernel_init=KAIMING_OUT,
            dtype=self.dtype, name="dw_conv",
        )(h)
        h = _bn(train, self.dtype, "bn1")(h)
        h = jax.nn.silu(h)

        h = SqueezeExcite(max(1, in_ch // 4), self.dtype, name="se")(h)

        h = nn.Conv(self.out_ch, (1, 1), use_bias=False, kernel_init=KAIMING_OUT,
                    dtype=self.dtype, name="project_conv")(h)
        h = _bn(train, self.dtype, "bn2")(h)

        if residual:
            h = x + DropPath(self.drop_path, name="drop_path")(h, not train)
            if self.use_mrla:
                # MRLA-light epilogue, resnet placement analogue:
                # o_{t-1} is the block input (identity).
                mrla = MRLALightModule(
                    dim_perhead=self.mrla_dim_perhead, name="mrla"
                )(h, x)
                mrla = _bn(train, self.dtype, "bn_mrla")(mrla)
                h = h + DropPath(self.drop_path, name="drop_path_mrla")(
                    mrla, not train
                )
        return h


class EfficientNet(nn.Module):
    """EfficientNet-B0 trunk (width/depth multipliers fixed at 1.0)."""

    num_classes: int = 1000
    use_mrla: bool = False
    drop_rate: float = 0.2
    drop_path_rate: float = 0.2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        x = nn.Conv(32, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                    use_bias=False, kernel_init=KAIMING_OUT, dtype=self.dtype,
                    name="stem_conv")(x)
        x = _bn(train, self.dtype, "stem_bn")(x)
        x = jax.nn.silu(x)

        total = sum(r for (_, _, r, _, _) in B0_BLOCKS)
        idx = 0
        for si, (expand, out_ch, repeats, stride, kernel) in enumerate(B0_BLOCKS):
            for bi in range(repeats):
                x = MBConv(
                    out_ch=out_ch,
                    expand=expand,
                    stride=stride if bi == 0 else 1,
                    kernel=kernel,
                    drop_path=self.drop_path_rate * idx / total,
                    use_mrla=self.use_mrla,
                    dtype=self.dtype,
                    name=f"stage{si}_{bi}",
                )(x, train)
                idx += 1

        x = nn.Conv(1280, (1, 1), use_bias=False, kernel_init=KAIMING_OUT,
                    dtype=self.dtype, name="head_conv")(x)
        x = _bn(train, self.dtype, "head_bn")(x)
        x = jax.nn.silu(x)
        x = jnp.mean(x, axis=(1, 2))
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(
            x.astype(self.dtype)
        )
        return x.astype(jnp.float32)


@register_model
def efficientnet_b0(**kw):
    return EfficientNet(**kw)


@register_model
def efficientnet_mrlal_b0(**kw):
    """The README-recipe model (source absent upstream; re-derived here)."""
    return EfficientNet(use_mrla=True, **kw)
