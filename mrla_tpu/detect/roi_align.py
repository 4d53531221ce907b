"""Multi-level RoIAlign (MMDetection ``SingleRoIExtractor`` semantics).

The reference's two-stage configs extract RoI features with::

    roi_layer=dict(type='RoIAlign', output_size=7, sampling_ratio=0),
    out_channels=256, featmap_strides=[4, 8, 16, 32]
    (mmdetection/configs/_base_/models/faster_rcnn_r50mrlal_fpn.py:38-43)

Semantics re-derived from mmcv/torchvision's documented aligned RoIAlign
and mmdet's ``map_roi_levels``:

  * level assignment: ``lvl = clamp(floor(log2(sqrt(w·h)/56 + 1e-6)),
    0, L-1)`` (finest_scale = 56);
  * aligned sampling: roi coords scaled by 1/stride then shifted by −0.5
    (pixel-center alignment, no size clamping);
  * each output bin averages a grid of bilinear samples; points outside
    [−1, H] contribute zero, in-range points clamp to the border.

TPU deviations (static shapes, documented):

  * ``sampling_ratio=0`` upstream means a PER-ROI adaptive grid
    (``ceil(bin_size)`` samples) — data-dependent shapes.  Here the grid
    is a static ``sampling_ratio`` (default 2; with the FPN level mapping
    bins are 2–4 cells, so 2 is within the adaptive range).
  * all pyramid levels are flattened into ONE [ΣHW, C] array so every
    roi's gather is a single take along one axis regardless of its level
    — no per-level branching, no 4× duplicate compute.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def map_roi_levels(
    rois: jax.Array, num_levels: int, finest_scale: float = 56.0
) -> jax.Array:
    """rois [..., 4] xyxy -> int32 pyramid level in [0, num_levels)."""
    scale = jnp.sqrt(
        jnp.maximum(rois[..., 2] - rois[..., 0], 0.0)
        * jnp.maximum(rois[..., 3] - rois[..., 1], 0.0)
    )
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    return jnp.clip(lvl, 0, num_levels - 1).astype(jnp.int32)


def _sample_coords(start, end, out_size: int, sr: int):
    """Aligned sample-point coordinates along one axis:
    [..., out_size*sr] for any leading shape of start/end."""
    bin_size = (end - start) / out_size  # [...]
    # point (ph, i): start + (ph + (i + .5)/sr) * bin
    frac = (
        jnp.arange(out_size)[:, None] + (jnp.arange(sr)[None, :] + 0.5) / sr
    ).reshape(-1)  # [out_size*sr]
    return start[..., None] + frac * bin_size[..., None]


_sample_coords_nd = _sample_coords


def _axis_weights(t: jax.Array, size: jax.Array):
    """Bilinear low/high indices + weights along one axis with
    torchvision's border rules.  t [...] float, size [...] int (per-roi
    level height/width).  Returns (lo, hi, w_lo, w_hi, in_range)."""
    in_range = (t >= -1.0) & (t <= size.astype(t.dtype))
    tc = jnp.clip(t, 0.0, size.astype(t.dtype) - 1.0)
    lo = jnp.floor(tc).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, size - 1)
    w_hi = tc - lo.astype(t.dtype)
    return lo, hi, 1.0 - w_hi, w_hi, in_range


def batched_roi_align(
    feats: Sequence[jax.Array],
    rois: jax.Array,
    roi_valid: Optional[jax.Array] = None,
    strides: Sequence[int] = (4, 8, 16, 32),
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
) -> jax.Array:
    """feats per-level [B, H_l, W_l, C]; rois [B, P, 4] xyxy in image
    coordinates; roi_valid [B, P] -> [B, P, out, out, C] with invalid
    rows zeroed.

    Gather layout (measured on v5e, 8x1000 rois at COCO sizes —
    scripts/exp_roialign.py): ALL levels and ALL batch entries flatten
    into one [B*sumHW, C] row axis and each bilinear corner is one plain
    `jnp.take` — 21% faster than a vmapped per-image gather (batched
    gather dims lower worse) and 27x faster than a row-pair `lax.gather`
    with slice_sizes=(2, C), which TPU serializes.  The stage is
    gather-ROW-bound, not byte-bound (bf16 buys ~3%): halving
    ``sampling_ratio`` to 1 is the 3x speed knob when the adaptive-grid
    fidelity isn't needed.

    Degenerate/padded rois read level 0 garbage-free: their sample
    points collapse and out-of-range weights zero the contribution.
    """
    num_levels = len(strides)
    assert len(feats) == num_levels
    b = feats[0].shape[0]
    c = feats[0].shape[-1]
    heights = np.array([f.shape[1] for f in feats], np.int32)
    widths = np.array([f.shape[2] for f in feats], np.int32)
    offsets = np.concatenate(
        [[0], np.cumsum(heights * widths)[:-1]]
    ).astype(np.int32)
    sum_hw = int((heights * widths).sum())
    flat = jnp.concatenate(
        [f.reshape(b, -1, c) for f in feats], axis=1
    ).reshape(b * sum_hw, c)

    lvl = map_roi_levels(rois, num_levels, finest_scale)  # [B, P]
    stride = jnp.asarray(np.asarray(strides, np.float32))[lvl]
    h_l = jnp.asarray(heights)[lvl]
    w_l = jnp.asarray(widths)[lvl]
    off = jnp.asarray(offsets)[lvl] + (
        jnp.arange(b, dtype=jnp.int32) * sum_hw
    )[:, None]  # [B, P] — level offset + image offset in the flat axis

    scale = 1.0 / stride
    x1 = rois[..., 0] * scale - 0.5
    y1 = rois[..., 1] * scale - 0.5
    x2 = rois[..., 2] * scale - 0.5
    y2 = rois[..., 3] * scale - 0.5

    sr = sampling_ratio
    ys = _sample_coords_nd(y1, y2, out_size, sr)  # [B, P, S]
    xs = _sample_coords_nd(x1, x2, out_size, sr)
    y_lo, y_hi, wy_lo, wy_hi, y_ok = _axis_weights(ys, h_l[..., None])
    x_lo, x_hi, wx_lo, wx_hi, x_ok = _axis_weights(xs, w_l[..., None])
    wy_lo = jnp.where(y_ok, wy_lo, 0.0)
    wy_hi = jnp.where(y_ok, wy_hi, 0.0)
    wx_lo = jnp.where(x_ok, wx_lo, 0.0)
    wx_hi = jnp.where(x_ok, wx_hi, 0.0)

    def corner(yi, xi, wy, wx):
        # flat index [B, P, S, S]; one take -> [B, P, S, S, C]
        idx = (
            off[..., None, None]
            + yi[..., :, None] * w_l[..., None, None]
            + xi[..., None, :]
        )
        vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
            idx.shape + (c,)
        )
        return vals * (wy[..., :, None] * wx[..., None, :])[..., None]

    acc = (
        corner(y_lo, x_lo, wy_lo, wx_lo)
        + corner(y_lo, x_hi, wy_lo, wx_hi)
        + corner(y_hi, x_lo, wy_hi, wx_lo)
        + corner(y_hi, x_hi, wy_hi, wx_hi)
    )  # [B, P, S, S, C]
    p = rois.shape[1]
    s = out_size
    acc = acc.reshape(b, p, s, sr, s, sr, c).mean(axis=(3, 5))
    if roi_valid is not None:
        acc = acc * roi_valid[..., None, None, None].astype(acc.dtype)
    return acc


def roi_align_multilevel(
    feats: Sequence[jax.Array],
    rois: jax.Array,
    strides: Sequence[int] = (4, 8, 16, 32),
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
) -> jax.Array:
    """Single-image form: feats per-level [H_l, W_l, C], rois [P, 4]
    -> [P, out, out, C].  Thin wrapper over :func:`batched_roi_align`."""
    out = batched_roi_align(
        [f[None] for f in feats], rois[None], None,
        strides, out_size, sampling_ratio, finest_scale,
    )
    return out[0]
