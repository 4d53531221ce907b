"""Feature Pyramid Network neck (MMDetection-compatible semantics).

Matches the configs grafted by the reference
(mmdetection/configs/_base_/models/faster_rcnn_r50mrlal_fpn.py:15-19:
in_channels=[256,512,1024,2048], out_channels=256, num_outs=5;
retinanet_r50mrlal_fpn.py: start_level=1, add_extra_convs='on_input',
num_outs=5):

  * lateral 1x1 convs on C_i, top-down nearest-x2 upsample + add,
    3x3 output convs -> P_i.
  * extra levels: maxpool stride 2 on the last P (faster/mask-rcnn style)
    or stride-2 convs on the last input/output (retinanet style).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def _upsample_nearest_to(x: jax.Array, h_out: int, w_out: int) -> jax.Array:
    """Nearest upsample to an EXACT target size (MMDet uses
    F.interpolate(size=prev_shape): with odd feature sizes — e.g. the
    presets' own 1333px side gives C2..C5 = 334/167/84/42 — a hard 2x
    would produce 168 vs the 167 lateral and crash the add)."""
    b, h, w, c = x.shape
    if (h_out, w_out) == (2 * h, 2 * w):
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return x.reshape(b, 2 * h, 2 * w, c)
    rows = jnp.floor(jnp.arange(h_out) * (h / h_out)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w_out) * (w / w_out)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Optional[str] = None  # None | "on_input" | "on_output"
    relu_before_extra_convs: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, inputs: Sequence[jax.Array]) -> tuple[jax.Array, ...]:
        used = list(inputs[self.start_level:])
        # mmdet end_level semantics: with num_outs < pyramid depth the top
        # levels are excluded ENTIRELY (no lateral/output conv params, no
        # top-down contribution) — not built-then-trimmed.
        if self.num_outs < len(used):
            used = used[: self.num_outs]
        n = len(used)

        laterals = [
            nn.Conv(self.out_channels, (1, 1), dtype=self.dtype, name=f"lateral{i}")(
                used[i]
            )
            for i in range(n)
        ]
        # top-down pathway (size-matched, like mmdet's interpolate(size=...))
        for i in range(n - 1, 0, -1):
            _, th, tw, _ = laterals[i - 1].shape
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_to(
                laterals[i], th, tw
            )

        outs = [
            nn.Conv(
                self.out_channels, (3, 3), padding=((1, 1), (1, 1)),
                dtype=self.dtype, name=f"fpn_conv{i}",
            )(laterals[i])
            for i in range(n)
        ]

        # extra levels
        while len(outs) < self.num_outs:
            if self.add_extra_convs is None:
                # parameter-free: stride-2 maxpool on the last output
                outs.append(
                    nn.max_pool(outs[-1], (1, 1), strides=(2, 2), padding="VALID")
                )
            else:
                src = (
                    used[-1]
                    if self.add_extra_convs == "on_input" and len(outs) == n
                    else outs[-1]
                )
                if self.relu_before_extra_convs and len(outs) > n:
                    src = nn.relu(src)
                outs.append(
                    nn.Conv(
                        self.out_channels, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)), dtype=self.dtype,
                        name=f"extra_conv{len(outs)}",
                    )(src)
                )
        return tuple(outs)
