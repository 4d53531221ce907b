"""Detection losses: sigmoid focal + L1, and the RetinaNet training loss.

Matches the reference's bbox_head loss config
(mmdetection/configs/_base_/models/retinanet_r50mrlal_fpn.py:37-44)::

    loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0,
                  alpha=0.25, loss_weight=1.0),
    loss_bbox=dict(type='L1Loss', loss_weight=1.0)

mmdet semantics re-derived (upstream not vendored in the snapshot):

  * focal:  ``w = (α·t + (1−α)(1−t)) · (t(1−p) + (1−t)p)^γ``;
    ``loss = w · BCE(logit, t)`` elementwise over all C class channels
    with one-hot targets (background anchors → all-zero rows);
  * normalization: both losses divide by ``avg_factor = max(num_pos, 1)``
    — the positive-anchor count over the whole batch (mmdet's
    ``num_total_pos`` with sampling disabled, ``reduce_mean``'d across
    GPUs; under our DP trainer each shard normalizes locally, matching
    per-replica BN in the same recipe);
  * L1 runs on encoded deltas (``reg_decoded_bbox=False``) and only on
    positive anchors.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp

from mrla_tpu.detect.anchors import pyramid_anchors
from mrla_tpu.detect.targets import anchor_targets


def sigmoid_focal_loss(
    logits: jax.Array,
    targets: jax.Array,
    alpha: float = 0.25,
    gamma: float = 2.0,
) -> jax.Array:
    """Elementwise focal loss on raw logits; ``targets`` in {0, 1}."""
    p = jax.nn.sigmoid(logits)
    # numerically stable BCE-with-logits
    ce = jnp.maximum(logits, 0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    p_t = p * targets + (1 - p) * (1 - targets)
    alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
    return alpha_t * (1 - p_t) ** gamma * ce


def retinanet_loss(
    level_outputs: Sequence[Tuple[jax.Array, jax.Array]],
    gt_boxes: jax.Array,
    gt_labels: jax.Array,
    gt_valid: jax.Array,
    num_classes: int,
    strides: Sequence[int] = (8, 16, 32, 64, 128),
    octave_base_scale: float = 4.0,
    scales_per_octave: int = 3,
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    alpha: float = 0.25,
    gamma: float = 2.0,
    pos_iou_thr: float = 0.5,
    neg_iou_thr: float = 0.4,
    min_pos_iou: float = 0.0,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
) -> Dict[str, jax.Array]:
    """Batch training loss for RetinaNet head outputs.

    level_outputs: per level (cls [B,H,W,A*C] logits, reg [B,H,W,A*4])
    from ``detect.RetinaNet``; gt_boxes [B, G, 4] xyxy padded,
    gt_labels [B, G] int, gt_valid [B, G] bool.

    Returns {'loss', 'loss_cls', 'loss_bbox', 'num_pos'}.
    """
    strides = strides[: len(level_outputs)]
    featmap_sizes = [c.shape[1:3] for c, _ in level_outputs]
    anchors = jnp.concatenate(
        [
            jnp.asarray(a)
            for a in pyramid_anchors(
                featmap_sizes, strides, octave_base_scale,
                scales_per_octave, ratios,
            )
        ],
        axis=0,
    )  # [N, 4]
    b = level_outputs[0][0].shape[0]
    cls_logits = jnp.concatenate(
        [c.reshape(b, -1, num_classes).astype(jnp.float32)
         for c, _ in level_outputs],
        axis=1,
    )  # [B, N, C]
    bbox_preds = jnp.concatenate(
        [r.reshape(b, -1, 4).astype(jnp.float32) for _, r in level_outputs],
        axis=1,
    )  # [B, N, 4]

    labels, label_w, bbox_t, bbox_w, num_pos = jax.vmap(
        lambda gb, gl, gv: anchor_targets(
            anchors, gb, gl, gv, num_classes,
            pos_iou_thr, neg_iou_thr, min_pos_iou,
            target_means, target_stds,
        )
    )(gt_boxes, gt_labels, gt_valid)

    avg_factor = jnp.maximum(num_pos.sum().astype(jnp.float32), 1.0)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=jnp.float32)
    loss_cls = (
        sigmoid_focal_loss(cls_logits, onehot, alpha, gamma)
        * label_w[..., None]
    ).sum() / avg_factor
    loss_bbox = (
        jnp.abs(bbox_preds - bbox_t).sum(-1) * bbox_w
    ).sum() / avg_factor
    return {
        "loss": loss_cls + loss_bbox,
        "loss_cls": loss_cls,
        "loss_bbox": loss_bbox,
        "num_pos": num_pos.sum(),
    }
