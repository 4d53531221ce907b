"""Box coding, IoU, and TPU-shaped NMS (MMDetection semantics).

The reference's detector configs use ``DeltaXYWHBBoxCoder`` with
``target_means=[0,0,0,0]``, ``target_stds=[1,1,1,1]`` and test-time
``nms=dict(type='nms', iou_threshold=0.5), score_thr=0.05,
max_per_img=100`` (mmdetection/configs/_base_/models/
retinanet_r50mrlal_fpn.py).  Upstream mmdet is not vendored in the
snapshot; the decode/NMS math below re-derives its documented semantics
(delta decode with wh_ratio_clip, class-offset batched NMS).

TPU shape discipline: everything returns FIXED shapes.  NMS emits exactly
``max_out`` slots plus a validity mask via a ``lax.fori_loop`` of
pick-argmax / suppress-overlaps steps — data-dependent candidate counts
never reach XLA.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp


def bbox2delta(proposals: jax.Array, gt: jax.Array,
               means=(0.0, 0.0, 0.0, 0.0),
               stds=(1.0, 1.0, 1.0, 1.0)) -> jax.Array:
    """Encode gt boxes as (dx, dy, dw, dh) deltas w.r.t. proposals.

    Both [..., 4] in (x1, y1, x2, y2).  Inverse of :func:`delta2bbox`.
    """
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]
    gx = (gt[..., 0] + gt[..., 2]) * 0.5
    gy = (gt[..., 1] + gt[..., 3]) * 0.5
    gw = gt[..., 2] - gt[..., 0]
    gh = gt[..., 3] - gt[..., 1]
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(gw / pw)
    dh = jnp.log(gh / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(rois: jax.Array, deltas: jax.Array,
               means=(0.0, 0.0, 0.0, 0.0),
               stds=(1.0, 1.0, 1.0, 1.0),
               max_shape: Tuple[int, int] | None = None,
               wh_ratio_clip: float = 16.0 / 1000.0) -> jax.Array:
    """Decode (dx, dy, dw, dh) deltas on anchor boxes -> (x1, y1, x2, y2).

    rois [..., 4], deltas [..., 4]; dw/dh are clamped to
    ``|log(wh_ratio_clip)|`` and boxes clipped to ``max_shape`` (H, W)
    when given — mmdet DeltaXYWHBBoxCoder.decode semantics.
    """
    means = jnp.asarray(means, deltas.dtype)
    stds = jnp.asarray(stds, deltas.dtype)
    d = deltas * stds + means
    dx, dy, dw, dh = d[..., 0], d[..., 1], d[..., 2], d[..., 3]
    max_ratio = abs(math.log(wh_ratio_clip))
    dw = jnp.clip(dw, -max_ratio, max_ratio)
    dh = jnp.clip(dh, -max_ratio, max_ratio)
    px = (rois[..., 0] + rois[..., 2]) * 0.5
    py = (rois[..., 1] + rois[..., 3]) * 0.5
    pw = rois[..., 2] - rois[..., 0]
    ph = rois[..., 3] - rois[..., 1]
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)
    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    if max_shape is not None:
        h, w = max_shape
        x1 = jnp.clip(x1, 0, w)
        x2 = jnp.clip(x2, 0, w)
        y1 = jnp.clip(y1, 0, h)
        y2 = jnp.clip(y2, 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_overlaps(a: jax.Array, b: jax.Array) -> jax.Array:
    """Pairwise IoU: a [N, 4], b [M, 4] -> [N, M]."""
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = jnp.clip(rb - lt, 0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    return inter / jnp.maximum(union, 1e-10)


def nms_fixed(boxes: jax.Array, scores: jax.Array, iou_threshold: float,
              max_out: int) -> Tuple[jax.Array, jax.Array]:
    """Greedy NMS with a fixed output size.

    boxes [N, 4], scores [N] (entries <= 0 are treated as absent).
    Returns (indices [max_out] int32, valid [max_out] bool): the kept boxes
    in descending score order.  max_out iterations of argmax + suppression;
    with mmdet's max_per_img=100 this is 100 tiny steps over an IoU row —
    cheap, static, and jittable.
    """
    n = boxes.shape[0]
    iou = bbox_overlaps(boxes, boxes)  # [N, N]

    def body(i, state):
        live_scores, idxs, valid = state
        best = jnp.argmax(live_scores)
        best_score = live_scores[best]
        ok = best_score > 0.0
        idxs = idxs.at[i].set(jnp.where(ok, best, -1).astype(jnp.int32))
        valid = valid.at[i].set(ok)
        # suppress the pick itself and everything overlapping it
        suppress = (iou[best] > iou_threshold) | (
            jnp.arange(n) == best
        )
        live_scores = jnp.where(
            ok & suppress, -jnp.inf, live_scores
        )
        return live_scores, idxs, valid

    init = (
        jnp.where(scores > 0.0, scores, -jnp.inf),
        jnp.full((max_out,), -1, jnp.int32),
        jnp.zeros((max_out,), bool),
    )
    _, idxs, valid = jax.lax.fori_loop(0, max_out, body, init)
    return idxs, valid


def soft_nms_fixed(
    boxes: jax.Array,
    scores: jax.Array,
    iou_threshold: float,
    max_out: int,
    method: str = "linear",
    sigma: float = 0.5,
    min_score: float = 1e-3,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Soft-NMS with a fixed output size (mmdet supports it for rcnn
    testing — faster_rcnn_r50mrlal_fpn.py:107-108 comment).

    Instead of removing overlaps, each pick DECAYS the remaining scores:
    ``linear``: s *= 1 - iou (only where iou > iou_threshold);
    ``gaussian``: s *= exp(-iou^2 / sigma) (everywhere).  Picks stop
    contributing once the best remaining score <= min_score.

    Returns (indices [max_out] int32, decayed_scores [max_out],
    valid [max_out] bool) in pick order.
    """
    n = boxes.shape[0]
    iou = bbox_overlaps(boxes, boxes)

    def body(i, state):
        live, idxs, out_scores, valid = state
        best = jnp.argmax(live)
        bs = live[best]
        ok = bs > min_score
        idxs = idxs.at[i].set(jnp.where(ok, best, -1).astype(jnp.int32))
        out_scores = out_scores.at[i].set(jnp.where(ok, bs, 0.0))
        valid = valid.at[i].set(ok)
        row = iou[best]
        if method == "linear":
            decay = jnp.where(row > iou_threshold, 1.0 - row, 1.0)
        elif method == "gaussian":
            decay = jnp.exp(-(row * row) / sigma)
        else:
            raise ValueError(f"unknown soft-nms method: {method}")
        # decay only finite (not-yet-picked) entries: -inf * 0 would NaN
        # on exact-duplicate boxes (linear decay hits 0 at iou == 1)
        decayed = jnp.where(jnp.isfinite(live), live * decay, live)
        live = jnp.where(ok, decayed, live)
        live = live.at[best].set(-jnp.inf)
        return live, idxs, out_scores, valid

    init = (
        jnp.where(scores > 0.0, scores, -jnp.inf),
        jnp.full((max_out,), -1, jnp.int32),
        jnp.zeros((max_out,)),
        jnp.zeros((max_out,), bool),
    )
    _, idxs, out_scores, valid = jax.lax.fori_loop(0, max_out, body, init)
    return idxs, out_scores, valid


def multiclass_nms_fixed(
    boxes: jax.Array,
    scores: jax.Array,
    score_thr: float,
    iou_threshold: float,
    max_per_img: int,
    pre_nms_top_n: int = 1000,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Class-wise NMS over one image (mmdet ``multiclass_nms`` semantics).

    boxes [N, 4] (class-agnostic, RetinaNet style) or [N, C, 4]
    (class-specific, R-CNN ``reg_class_agnostic=False`` style); scores
    [N, C] probabilities.  Each (box, class) pair with score > score_thr
    is a candidate; NMS never suppresses across classes (implemented by
    offsetting box coordinates per class — mmdet's batched_nms trick).

    mmdet filters candidates by score_thr (dynamic shape); the fixed-shape
    equivalent here keeps the ``pre_nms_top_n`` best-scoring (box, class)
    pairs — a superset of anything that can reach the top ``max_per_img``
    detections as long as fewer than pre_nms_top_n pairs survive NMS, and
    it bounds the quadratic IoU matrix at [K, K] instead of [N*C, N*C].

    Returns (det_boxes [M, 4], det_scores [M], det_labels [M] int32,
    valid [M] bool) with M = max_per_img, score-sorted.
    """
    n, num_classes = scores.shape
    flat_scores = scores.reshape(-1)  # [N*C], class-minor
    flat_scores = jnp.where(flat_scores > score_thr, flat_scores, 0.0)
    k = min(pre_nms_top_n, n * num_classes)
    top_scores, top_idx = jax.lax.top_k(flat_scores, k)
    labels = (top_idx % num_classes).astype(jnp.int32)
    if boxes.ndim == 3:
        top_boxes = boxes[top_idx // num_classes, labels]  # [K, 4]
    else:
        top_boxes = boxes[top_idx // num_classes]  # [K, 4]
    # class-offset so cross-class pairs never overlap
    span = jnp.max(boxes) + 1.0
    offset_boxes = top_boxes + (labels.astype(boxes.dtype) * span)[:, None]
    idxs, valid = nms_fixed(
        offset_boxes, top_scores, iou_threshold, max_per_img
    )
    safe = jnp.maximum(idxs, 0)
    return (
        jnp.where(valid[:, None], top_boxes[safe], 0.0),
        jnp.where(valid, top_scores[safe], 0.0),
        jnp.where(valid, labels[safe], -1),
        valid,
    )
