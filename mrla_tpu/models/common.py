"""Shared conv-net building blocks (NHWC, Flax linen, bf16-friendly).

Init parity with the reference (resnet_mrla_light.py:176-188): convs are
kaiming-normal fan_out; BN scale=1, bias=0; the last BN of every residual
branch (bn3) is zero-initialized when ``zero_init_last_bn``.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

KAIMING_OUT = nn.initializers.variance_scaling(2.0, "fan_out", "normal")

Dtype = Any


def conv3x3(
    features: int,
    stride: int = 1,
    groups: int = 1,
    dilation: int = 1,
    dtype: Dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(3, 3),
        strides=(stride, stride),
        padding=((dilation, dilation), (dilation, dilation)),
        kernel_dilation=(dilation, dilation),
        feature_group_count=groups,
        use_bias=False,
        kernel_init=KAIMING_OUT,
        dtype=dtype,
        name=name,
    )


def conv1x1(
    features: int,
    stride: int = 1,
    dtype: Dtype = jnp.float32,
    name: Optional[str] = None,
) -> nn.Conv:
    return nn.Conv(
        features,
        kernel_size=(1, 1),
        strides=(stride, stride),
        use_bias=False,
        kernel_init=KAIMING_OUT,
        dtype=dtype,
        name=name,
    )


def batch_norm(
    train: bool,
    dtype: Dtype = jnp.float32,
    zero_init: bool = False,
    name: Optional[str] = None,
) -> nn.BatchNorm:
    """BatchNorm matching torch defaults (eps 1e-5, running-stat decay 0.1)."""
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.9,
        epsilon=1e-5,
        dtype=dtype,
        scale_init=nn.initializers.zeros if zero_init else nn.initializers.ones,
        name=name,
    )


class ClassifierHead(nn.Module):
    """GAP -> (dropout) -> Linear, the reference classification head."""

    num_classes: int
    drop_rate: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = jnp.mean(x, axis=(1, 2))  # [B, C]
        if self.drop_rate > 0.0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)
        # torch Linear default init: uniform(-1/sqrt(fan_in), +) for both
        # kernel and bias.
        fan_in = x.shape[-1]
        lim = 1.0 / (fan_in ** 0.5)
        uinit = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
            key, shape, dtype, -lim, lim
        )
        x = nn.Dense(
            self.num_classes,
            kernel_init=uinit,
            bias_init=uinit,
            dtype=self.dtype,
            name="fc",
        )(x.astype(self.dtype))
        return x.astype(jnp.float32)


class Stem7x7(nn.Module):
    """Classic ResNet stem: 7x7/2 conv -> BN -> ReLU (maxpool applied by caller)."""

    width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = nn.Conv(
            self.width,
            kernel_size=(7, 7),
            strides=(2, 2),
            padding=((3, 3), (3, 3)),
            use_bias=False,
            kernel_init=KAIMING_OUT,
            dtype=self.dtype,
            name="conv1",
        )(x)
        x = batch_norm(train, self.dtype, name="bn1")(x)
        return nn.relu(x)


class DeepStem(nn.Module):
    """3-conv deep stem of MRLA-base (reference resnet_mrla_base.py:176-187):
    3x3/2 -> BN -> ReLU -> 3x3 -> BN -> ReLU -> 3x3 -> (outer BN+ReLU by caller)."""

    stem_width: int = 32
    out_width: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = conv3x3(self.stem_width, stride=2, dtype=self.dtype, name="conv1a")(x)
        x = batch_norm(train, self.dtype, name="bn1a")(x)
        x = nn.relu(x)
        x = conv3x3(self.stem_width, dtype=self.dtype, name="conv1b")(x)
        x = batch_norm(train, self.dtype, name="bn1b")(x)
        x = nn.relu(x)
        x = conv3x3(self.out_width, dtype=self.dtype, name="conv1c")(x)
        x = batch_norm(train, self.dtype, name="bn1")(x)
        return nn.relu(x)


class Downsample(nn.Module):
    """1x1-conv + BN shortcut projection."""

    features: int
    stride: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        x = conv1x1(self.features, self.stride, self.dtype, name="conv")(x)
        return batch_norm(train, self.dtype, name="bn")(x)
