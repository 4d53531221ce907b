"""Shared primitives for the MRLA op family.

TPU-first notes:
  * All image tensors are NHWC (TPU-native layout; the reference is NCHW).
  * ``channel_conv1d`` — the ECA-style k-tap conv *across the channel axis* of a
    pooled [B, C] descriptor — is expressed as k shifted adds instead of a
    degenerate lax.conv: k <= 5 always (C <= 2048), so this is a handful of VPU
    fused multiply-adds that XLA folds into the surrounding epilogue, with no
    im2col or conv dispatch.

Behavioral parity: reference kernel-size heuristic at
/root/reference/resnet/models/modules/eca_module.py:17-19 and
mrla_light_module.py:40-43 (k = t if t odd else t+1, t = int(|log2(C)+1|/2)).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp


def eca_kernel_size(channels: int) -> int:
    """Adaptive 1-D kernel size over the channel axis (ECA heuristic)."""
    t = int(abs((math.log2(channels) + 1) / 2.0))
    return t if t % 2 else t + 1


def global_avg_pool(x: jax.Array) -> jax.Array:
    """NHWC [B, H, W, C] -> [B, C] spatial mean.

    Mean is taken in float32 regardless of input dtype (bf16 activations):
    the GAP feeds tiny Q/K projections, so fp32 here is free and keeps the
    attention logits well-conditioned.
    """
    return jnp.mean(x.astype(jnp.float32), axis=(1, 2))


def channel_conv1d(y: jax.Array, w: jax.Array) -> jax.Array:
    """Bias-free cross-correlation of a [..., C] descriptor with a k-tap kernel
    along the channel axis, SAME-padded (matches torch Conv1d(1, 1, k,
    padding=(k-1)//2, bias=False) applied to a [B, 1, C] tensor).

    Args:
      y: [..., C] channel descriptor (typically the GAP output).
      w: [k] kernel taps, k odd and static.

    Returns:
      [..., C], same dtype as y.
    """
    k = w.shape[-1]
    if k == 1:
        return y * w[0]
    pad = (k - 1) // 2
    widths = [(0, 0)] * (y.ndim - 1) + [(pad, pad)]
    yp = jnp.pad(y, widths)
    c = y.shape[-1]
    # k static shifted views; XLA fuses these into one vectorized expression.
    out = jnp.zeros_like(y)
    for j in range(k):
        out = out + w[j] * jax.lax.dynamic_slice_in_dim(yp, j, c, axis=y.ndim - 1)
    return out


def depthwise_conv3x3(x: jax.Array, w: jax.Array) -> jax.Array:
    """Depthwise 3x3 SAME conv on NHWC input (the MRLA value projection Wv).

    Args:
      x: [B, H, W, C].
      w: [3, 3, 1, C] HWIO depthwise kernel.

    Equivalent of torch Conv2d(C, C, 3, padding=1, groups=C, bias=False)
    (/root/reference/resnet/models/modules/mrla_light_module.py:48).

    Perf note (round 2, measured on v5e): this MUST stay lax.conv with
    feature_group_count=C.  It lowers to a standalone `convolution` op, but
    the "fusible" alternative — nine statically-shifted multiply-adds over a
    padded view — amplifies HBM reads ~9x inside the fusion and cost 40%
    end-to-end model throughput (7641 -> 4524 img/s).  The TPU depthwise
    conv emitter's private pass is far cheaper than slice-level fusion.
    """
    c = x.shape[-1]
    return jax.lax.conv_general_dilated(
        x,
        w.astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )


@partial(jax.jit, static_argnames=("window", "stride"))
def max_pool_same_torch(x: jax.Array, window: int = 3, stride: int = 2) -> jax.Array:
    """Max pool matching torch MaxPool2d(kernel, stride, padding=1) on NHWC."""
    pad = (window - 1) // 2
    return jax.lax.reduce_window(
        x,
        -jnp.inf if jnp.issubdtype(x.dtype, jnp.floating) else jnp.iinfo(x.dtype).min,
        jax.lax.max,
        window_dimensions=(1, window, window, 1),
        window_strides=(1, stride, stride, 1),
        padding=((0, 0), (pad, pad), (pad, pad), (0, 0)),
    )
