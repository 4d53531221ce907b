"""Anchor assignment + training targets (MMDetection ``MaxIoUAssigner``).

The reference's detection train_cfg
(mmdetection/configs/_base_/models/retinanet_r50mrlal_fpn.py:45-55) is::

    assigner=dict(type='MaxIoUAssigner', pos_iou_thr=0.5, neg_iou_thr=0.4,
                  min_pos_iou=0, ignore_iof_thr=-1),
    allowed_border=-1, pos_weight=-1

Upstream mmdet (not vendored in the snapshot; semantics re-derived from
its documented algorithm) assigns, per anchor:

  1. ``-1`` (ignore) everywhere, then ``0`` (background) where the
     anchor's best IoU over all gts is below ``neg_iou_thr``;
  2. ``gt_index + 1`` where the best IoU ≥ ``pos_iou_thr``;
  3. low-quality matching: for each gt *in order*, every anchor tying the
     gt's own best IoU is (re)assigned to it when that best IoU ≥
     ``min_pos_iou`` (mmdet ``match_low_quality`` + ``gt_max_assign_all``
     defaults — later gts overwrite earlier ones, preserved here via a
     ``fori_loop`` over the gt axis).

TPU shape discipline: gt boxes arrive PADDED to a static ``[G, 4]`` with a
``gt_valid`` mask; padded rows get IoU −1 so they can never win, and an
image with zero valid gts makes every anchor background (mmdet's
``num_gt == 0`` special case falls out of the −1 rows + the
``best < neg_iou_thr`` test).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from mrla_tpu.detect.bbox import bbox2delta, bbox_overlaps


def max_iou_assign(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_valid: jax.Array,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.4,
    min_pos_iou: float = 0.0,
    match_low_quality: bool = True,
) -> jax.Array:
    """anchors [N, 4], gt_boxes [G, 4] (padded), gt_valid [G] bool ->
    assigned [N] int32: -1 ignore / 0 background / g+1 matched to gt g."""
    overlaps = bbox_overlaps(gt_boxes, anchors)  # [G, N]
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)
    anchor_max = jnp.max(overlaps, axis=0)  # [N]
    anchor_argmax = jnp.argmax(overlaps, axis=0).astype(jnp.int32)
    n = anchors.shape[0]
    assigned = jnp.full((n,), -1, jnp.int32)
    assigned = jnp.where(anchor_max < neg_iou_thr, 0, assigned)
    assigned = jnp.where(anchor_max >= pos_iou_thr, anchor_argmax + 1, assigned)
    if match_low_quality:
        gt_max = jnp.max(overlaps, axis=1)  # [G]

        def body(g, assigned):
            take = (
                gt_valid[g]
                & (gt_max[g] >= min_pos_iou)
                & (overlaps[g] == gt_max[g])
            )
            return jnp.where(take, g + 1, assigned)

        assigned = jax.lax.fori_loop(0, gt_boxes.shape[0], body, assigned)
    return assigned


def anchor_targets(
    anchors: jax.Array,
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_valid: jax.Array,
    num_classes: int,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.4,
    min_pos_iou: float = 0.0,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array, jax.Array]:
    """One image's dense targets (mmdet ``AnchorHead._get_targets_single``).

    Returns (labels [N] int32 — gt class for positives, ``num_classes``
    for background; label_weights [N] — 1 for pos+neg, 0 for ignored
    (``pos_weight=-1`` ⇒ positives also weigh 1); bbox_targets [N, 4]
    encoded deltas, zero off-positives; bbox_weights [N]; num_pos scalar).
    """
    assigned = max_iou_assign(
        anchors, gt_boxes, gt_valid, pos_iou_thr, neg_iou_thr, min_pos_iou
    )
    pos = assigned > 0
    gt_idx = jnp.maximum(assigned - 1, 0)
    labels = jnp.where(pos, gt_labels[gt_idx], num_classes).astype(jnp.int32)
    label_weights = (assigned >= 0).astype(jnp.float32)
    deltas = bbox2delta(anchors, gt_boxes[gt_idx], target_means, target_stds)
    bbox_targets = jnp.where(pos[:, None], deltas, 0.0)
    bbox_weights = pos.astype(jnp.float32)
    return labels, label_weights, bbox_targets, bbox_weights, pos.sum()
