"""Two-stage detectors (Faster/Mask R-CNN) on the MRLA backbone.

The reference grafts its backbone into MMDetection's FasterRCNN/MaskRCNN
(mmdetection/configs/_base_/models/faster_rcnn_r50mrlal_fpn.py,
mask_rcnn_r50mrlal_fpn.py); the detector code itself lives upstream.
This module completes the TPU side natively:

  * ``RPNHead``: shared 3×3 conv → 1×1 objectness (A·1, sigmoid) +
    1×1 regression (A·4); anchors scales=[8], ratios [.5,1,2],
    strides [4,8,16,32,64] (config:20-27);
  * ``rpn_proposals``: per-level top nms_pre → decode (means 0, stds 1)
    → clip → cross-level NMS at IoU 0.7 where levels never suppress each
    other (mmdet batched_nms with level ids) → top max_per_img, all at
    FIXED shapes with a validity mask;
  * ``Shared2FCBBoxHead``: flatten 7×7×256 RoI features → two fc(1024) →
    softmax classification over num_classes+1 (background LAST, the
    mmdet convention) + class-specific regression (config:44-56,
    stds [.1,.1,.2,.2]);
  * ``FCNMaskHead``: 4× conv(256) → 2× deconv upsample → per-class
    28×28 mask logits (mask_rcnn config:62-69);
  * ``FasterRCNN`` / ``MaskRCNN``: backbone (features_only, no DropPath)
    + FPN(num_outs=5, maxpool extra) + heads.  Param scopes:
    {backbone, neck, rpn_head, bbox_head[, mask_head]}.

Mask output contract (TPU-shaped): ``two_stage_predict`` returns soft
28×28 masks per detection (sigmoid of the detection's class channel);
pasting into image coordinates is a host-side resize of each box crop —
mmdet performs that step on CPU as well.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu.detect.anchors import pyramid_anchors
from mrla_tpu.detect.bbox import delta2bbox, multiclass_nms_fixed, nms_fixed
from mrla_tpu.detect.roi_align import batched_roi_align


def _roi_align_fn(backend: str):
    if backend == "pallas":
        from mrla_tpu.kernels.roialign_patch import roi_align_patch

        return roi_align_patch
    if backend != "xla":
        raise ValueError(f"unknown roi_backend {backend!r}")
    return batched_roi_align


RCNN_TARGET_STDS = (0.1, 0.1, 0.2, 0.2)
ROI_STRIDES = (4, 8, 16, 32)


class RPNHead(nn.Module):
    """mmdet RPNHead: conv3x3 → relu → {1×1 cls (A), 1×1 reg (A·4)}."""

    feat_channels: int = 256
    num_anchors: int = 3
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        t = nn.relu(
            nn.Conv(
                self.feat_channels,
                (3, 3),
                padding=((1, 1), (1, 1)),
                kernel_init=nn.initializers.normal(0.01),
                dtype=self.dtype,
                name="rpn_conv",
            )(x)
        )
        cls = nn.Conv(
            self.num_anchors,
            (1, 1),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="rpn_cls",
        )(t)
        reg = nn.Conv(
            self.num_anchors * 4,
            (1, 1),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="rpn_reg",
        )(t)
        return cls, reg


def rpn_proposals(
    level_outputs: Sequence[Tuple[jax.Array, jax.Array]],
    img_shape: Tuple[int, int],
    strides: Sequence[int] = (4, 8, 16, 32, 64),
    scales: Sequence[float] = (8.0,),
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    nms_pre: int = 1000,
    max_per_img: int = 1000,
    iou_threshold: float = 0.7,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Head outputs -> (proposals [B, R, 4], scores [B, R], valid [B, R]).

    mmdet RPNHead.get_bboxes semantics at fixed shapes; R = max_per_img.
    """
    # see detect/retinanet.get_bboxes: forward+decode fused in one XLA
    # program faults the TPU compiler at COCO shapes; barrier is a no-op
    level_outputs = jax.lax.optimization_barrier(tuple(level_outputs))
    strides = strides[: len(level_outputs)]
    featmap_sizes = [c.shape[1:3] for c, _ in level_outputs]
    # scales=[8] == one octave at base 8 in the shared generator
    anchors = pyramid_anchors(
        featmap_sizes,
        strides,
        octave_base_scale=float(scales[0]),
        scales_per_octave=len(scales),
        ratios=ratios,
    )

    def one_image(per_level):
        cand_boxes, cand_scores, cand_lvl = [], [], []
        for li, ((cls_map, reg_map), anc) in enumerate(
            zip(per_level, anchors)
        ):
            scores = jax.nn.sigmoid(
                cls_map.reshape(-1).astype(jnp.float32)
            )  # [HWA]
            deltas = reg_map.reshape(-1, 4).astype(jnp.float32)
            anc = jnp.asarray(anc)
            n = scores.shape[0]
            if n > nms_pre:
                top_scores, top = jax.lax.top_k(scores, nms_pre)
                scores, deltas, anc = top_scores, deltas[top], anc[top]
            boxes = delta2bbox(anc, deltas, max_shape=img_shape)
            cand_boxes.append(boxes)
            cand_scores.append(scores)
            cand_lvl.append(jnp.full(scores.shape, li, jnp.float32))
        boxes = jnp.concatenate(cand_boxes, 0)
        scores = jnp.concatenate(cand_scores, 0)
        lvl = jnp.concatenate(cand_lvl, 0)
        # levels never suppress each other: offset coordinates per level
        span = jnp.max(boxes) + 1.0
        idxs, valid = nms_fixed(
            boxes + (lvl * span)[:, None], scores, iou_threshold, max_per_img
        )
        safe = jnp.maximum(idxs, 0)
        return (
            jnp.where(valid[:, None], boxes[safe], 0.0),
            jnp.where(valid, scores[safe], 0.0),
            valid,
        )

    return jax.vmap(one_image)(tuple(level_outputs))


class Shared2FCBBoxHead(nn.Module):
    """mmdet Shared2FCBBoxHead: 2×fc(1024) shared trunk, softmax cls over
    num_classes+1 (background last), class-specific box regression."""

    num_classes: int = 80
    fc_out_channels: int = 1024
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feats: jax.Array) -> Tuple[jax.Array, jax.Array]:
        # roi_feats [..., 7, 7, C] -> logits [..., K+1], deltas [..., K*4]
        x = roi_feats.reshape(roi_feats.shape[:-3] + (-1,))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name="shared_fc0")(x))
        x = nn.relu(nn.Dense(self.fc_out_channels, dtype=self.dtype,
                             name="shared_fc1")(x))
        cls = nn.Dense(
            self.num_classes + 1,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.01),
            name="fc_cls",
        )(x)
        reg = nn.Dense(
            self.num_classes * 4,
            dtype=self.dtype,
            kernel_init=nn.initializers.normal(0.001),
            name="fc_reg",
        )(x)
        return cls, reg


class FCNMaskHead(nn.Module):
    """mmdet FCNMaskHead: 4× conv3x3 → 2× deconv → 1×1 per-class logits."""

    num_classes: int = 80
    conv_out_channels: int = 256
    num_convs: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        for i in range(self.num_convs):
            x = nn.relu(
                nn.Conv(
                    self.conv_out_channels,
                    (3, 3),
                    padding=((1, 1), (1, 1)),
                    dtype=self.dtype,
                    name=f"conv{i}",
                )(x)
            )
        x = nn.relu(
            nn.ConvTranspose(
                self.conv_out_channels,
                (2, 2),
                strides=(2, 2),
                dtype=self.dtype,
                name="upsample",
            )(x)
        )
        x = nn.Conv(
            self.num_classes, (1, 1), dtype=self.dtype, name="conv_logits"
        )(x)
        return x.reshape(lead + x.shape[1:])


class FasterRCNN(nn.Module):
    """Two-stage detector.  ``__call__`` runs backbone → FPN → RPN →
    proposals → RoIAlign → bbox head and returns raw stage outputs;
    decode with :func:`rcnn_detections` / :func:`two_stage_predict`."""

    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 80
    fpn_out_channels: int = 256
    rpn_nms_pre: int = 1000
    num_proposals: int = 1000
    with_mask: bool = False
    # RoIAlign grid: 2 matches mmdet's adaptive range (bins are 2-4
    # cells under the FPN level mapping); 1 is the 3x-faster serving
    # knob (the RoI stage is gather-row-bound — see detect/roi_align.py)
    roi_sampling_ratio: int = 2
    # 'xla' = flat-take gather (batched_roi_align); 'pallas' = patch-DMA
    # kernel (kernels/roialign_patch.py) — makes sampling_ratio=0 (the
    # reference presets' adaptive grid) cost the same as static grids,
    # and differentiable since round 5 (custom VJP: per-roi Ayᵀ·G·Ax +
    # RMW-DMA scatter), so training can run it too
    roi_backend: str = "xla"
    dtype: Any = jnp.float32
    # backbone rematerialization for big-batch training; at the reference
    # contract (bs8 COCO) it LOSES 11% — ROADMAP detection-train ledger
    remat: bool = False

    def setup(self):
        from mrla_tpu.detect.fpn import FPN
        from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight

        self.backbone = ResNetMRLALight(
            layers=list(self.layers),
            features_only=True,
            use_drop_path=False,  # mmdet epilogue has no DropPath
            dtype=self.dtype,
            remat=self.remat,
        )
        self.neck = FPN(
            out_channels=self.fpn_out_channels, num_outs=5, dtype=self.dtype
        )
        self.rpn_head = RPNHead(
            feat_channels=self.fpn_out_channels, num_anchors=3,
            dtype=self.dtype,
        )
        self.bbox_head = Shared2FCBBoxHead(
            num_classes=self.num_classes, dtype=self.dtype
        )
        if self.with_mask:
            self.mask_head = FCNMaskHead(
                num_classes=self.num_classes, dtype=self.dtype
            )

    def extract_feats(self, x: jax.Array, train: bool = False):
        return self.neck(self.backbone(x, train))  # P2..P6

    def mask_forward(self, mask_roi_feats: jax.Array) -> jax.Array:
        """[B, M, 14, 14, C] pooled features -> [B, M, 28, 28, K] logits."""
        return self.mask_head(mask_roi_feats)

    def rpn_forward(self, x: jax.Array, train: bool = False):
        """First stage only: (pyramid feats P2..P6, per-level rpn outs)."""
        feats = self.extract_feats(x, train)
        return feats, tuple(self.rpn_head(f) for f in feats)

    def bbox_forward(self, feats, rois: jax.Array, roi_valid: jax.Array):
        """Second stage on GIVEN rois (the training path pools only the
        sampled rois): (cls [B, R, K+1], reg [B, R, K*4])."""
        roi_feats = _roi_align_fn(self.roi_backend)(
            [f.astype(jnp.float32) for f in feats[:4]],
            rois,
            roi_valid,
            strides=ROI_STRIDES,
            out_size=7,
            sampling_ratio=self.roi_sampling_ratio,
        )
        return self.bbox_head(roi_feats.astype(self.dtype))

    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        proposals: Optional[jax.Array] = None,
        proposal_valid: Optional[jax.Array] = None,
    ):
        feats = self.extract_feats(x, train)
        rpn_outs = tuple(self.rpn_head(f) for f in feats)
        if proposals is None:
            proposals, _, proposal_valid = rpn_proposals(
                rpn_outs,
                (x.shape[1], x.shape[2]),
                nms_pre=self.rpn_nms_pre,
                max_per_img=self.num_proposals,
            )
        roi_feats = _roi_align_fn(self.roi_backend)(
            [f.astype(jnp.float32) for f in feats[:4]],
            proposals,
            proposal_valid,
            strides=ROI_STRIDES,
            out_size=7,
            sampling_ratio=self.roi_sampling_ratio,
        )
        cls, reg = self.bbox_head(roi_feats.astype(self.dtype))
        return {
            "rpn": rpn_outs,
            "proposals": proposals,
            "proposal_valid": proposal_valid,
            "cls": cls,
            "reg": reg,
            "feats": feats,
        }


class MaskRCNN(FasterRCNN):
    with_mask: bool = True


def init_detector(model: FasterRCNN, key, x: jax.Array):
    """Initialize ALL submodules (the mask branch only runs post-NMS, so a
    plain ``model.init`` would never create its params)."""

    def init_fn(m):
        out = m(x, train=False)
        if m.with_mask:
            c = out["feats"][0].shape[-1]
            m.mask_forward(
                jnp.zeros((x.shape[0], 1, 14, 14, c), m.dtype)
            )
        return out

    return model.init(key, method=init_fn)


def rcnn_detections(
    proposals: jax.Array,
    proposal_valid: jax.Array,
    cls_logits: jax.Array,
    bbox_deltas: jax.Array,
    img_shape: Tuple[int, int],
    score_thr: float = 0.05,
    iou_threshold: float = 0.5,
    max_per_img: int = 100,
    target_stds=RCNN_TARGET_STDS,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Second-stage decode: softmax scores (bg = LAST column dropped),
    class-specific delta decode, class-wise NMS.  Batched.

    Returns (boxes [B, M, 4], scores [B, M], labels [B, M], valid [B, M]).
    """
    num_classes = cls_logits.shape[-1] - 1

    def one(props, valid, logits, deltas):
        scores = jax.nn.softmax(logits.astype(jnp.float32), -1)[:, :-1]
        scores = scores * valid[:, None].astype(scores.dtype)
        boxes = delta2bbox(
            props[:, None, :],
            deltas.astype(jnp.float32).reshape(-1, num_classes, 4),
            stds=target_stds,
            max_shape=img_shape,
        )  # [P, K, 4]
        return multiclass_nms_fixed(
            boxes, scores, score_thr, iou_threshold, max_per_img
        )

    return jax.vmap(one)(proposals, proposal_valid, cls_logits, bbox_deltas)


def two_stage_predict(
    model: FasterRCNN,
    variables,
    x: jax.Array,
    score_thr: float = 0.05,
    iou_threshold: float = 0.5,
    max_per_img: int = 100,
):
    """Full test-time path: forward → proposals → detections (→ masks).

    Returns dict with det_boxes/det_scores/det_labels/det_valid and, for
    MaskRCNN, ``masks`` [B, M, 28, 28] soft masks (detection's class).
    """
    out = model.apply(variables, x, train=False)
    img_shape = (x.shape[1], x.shape[2])
    det_boxes, det_scores, det_labels, det_valid = rcnn_detections(
        out["proposals"], out["proposal_valid"], out["cls"], out["reg"],
        img_shape, score_thr, iou_threshold, max_per_img,
    )
    res = {
        "det_boxes": det_boxes,
        "det_scores": det_scores,
        "det_labels": det_labels,
        "det_valid": det_valid,
    }
    if model.with_mask:
        mask_feats = _roi_align_fn(model.roi_backend)(
            [f.astype(jnp.float32) for f in out["feats"][:4]],
            det_boxes,
            det_valid,
            strides=ROI_STRIDES,
            out_size=14,
            sampling_ratio=model.roi_sampling_ratio,
        )
        mask_logits = model.apply(
            variables,
            mask_feats.astype(model.dtype),
            method=FasterRCNN.mask_forward,
        )  # [B, M, 28, 28, K]
        lab = jnp.maximum(det_labels, 0).astype(jnp.int32)
        per_det = jnp.take_along_axis(
            mask_logits, lab[:, :, None, None, None], axis=-1
        )[..., 0]
        res["masks"] = jax.nn.sigmoid(per_det.astype(jnp.float32))
    return res
