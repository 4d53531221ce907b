"""Channel-gating attention ops: SE and ECA (NHWC, functional).

Reference behavior: /root/reference/resnet/models/modules/se_module.py:8-23
and eca_module.py:8-34.  Both are GAP -> tiny projection -> sigmoid -> scale;
on TPU they fuse entirely into the surrounding block epilogue.
"""

from __future__ import annotations

import jax

from mrla_tpu.ops.common import channel_conv1d, global_avg_pool


def se_gate(x: jax.Array, w1: jax.Array, w2: jax.Array) -> jax.Array:
    """Squeeze-and-excitation gate.

    Args:
      x: [B, H, W, C].
      w1: [C, C//r] first (bias-free) projection.
      w2: [C//r, C] second (bias-free) projection.
    """
    y = global_avg_pool(x)  # [B, C] fp32
    y = jax.nn.relu(y @ w1.astype(y.dtype))
    y = jax.nn.sigmoid(y @ w2.astype(y.dtype))
    return x * y[:, None, None, :].astype(x.dtype)


def eca_gate(x: jax.Array, w: jax.Array) -> jax.Array:
    """Efficient channel attention gate.

    Args:
      x: [B, H, W, C].
      w: [k] 1-D taps across the channel axis.
    """
    y = global_avg_pool(x)  # [B, C] fp32
    y = jax.nn.sigmoid(channel_conv1d(y, w.astype(y.dtype)))
    return x * y[:, None, None, :].astype(x.dtype)
