"""RetinaNet detector on the MRLA backbone — full inference path in JAX.

The reference ships detection as backbone + configs and delegates the
detector itself to upstream MMDetection (SURVEY.md §3.5); its RetinaNet
graft is configs/_base_/models/retinanet_r50mrlal_fpn.py:

  * bbox_head: RetinaHead, num_classes=80, stacked_convs=4,
    feat_channels=256, sigmoid focal classification;
  * anchors: octave_base_scale=4, scales_per_octave=3, ratios [.5,1,2],
    strides [8,16,32,64,128]  (-> A=9 anchors/cell);
  * test_cfg: nms_pre=1000, score_thr=0.05, nms iou 0.5, max_per_img=100.

This module completes the TPU side so a reference user can run the whole
detector natively: MRLABackboneFPN trunk (detect/backbone.py) + a
level-shared RetinaHead + fixed-shape decode/NMS (detect/bbox.py).  Head
convs follow mmdet's init (Normal std=0.01; classification bias set to the
focal prior -log((1-p)/p), p=0.01).  Weights from a trained mmdet
checkpoint load via ckpt.detect_convert.convert_mmdet_state_dict.

Channel layout contract: NHWC head outputs [B, H, W, A*K] reshape to
[B, H*W*A, K] in exactly the anchor order of detect/anchors.py
(location-major, anchor-minor; anchors ratio-major/scale-minor), matching
mmdet's permute(0,2,3,1).reshape(-1, K) on its NCHW maps.
"""

from __future__ import annotations

import functools
from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from mrla_tpu.detect.anchors import num_base_anchors, pyramid_anchors
from mrla_tpu.detect.bbox import delta2bbox, multiclass_nms_fixed


def focal_bias_init(prior_prob: float = 0.01):
    """mmdet bias_init_with_prob: start sigmoid outputs at the focal prior."""
    b = -float(np.log((1 - prior_prob) / prior_prob))

    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, b, dtype)

    return init


class RetinaHead(nn.Module):
    """Level-shared classification + regression head (mmdet RetinaHead).

    Called once per pyramid level with the SAME parameters (mmdet applies
    one head module to every level); returns
    (cls_score [B, H, W, A*num_classes] logits, bbox_pred [B, H, W, A*4]).
    """

    num_classes: int = 80
    feat_channels: int = 256
    stacked_convs: int = 4
    num_anchors: int = 9
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        conv = functools.partial(
            nn.Conv,
            features=self.feat_channels,
            kernel_size=(3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
        )
        cls_feat, reg_feat = x, x
        for i in range(self.stacked_convs):
            cls_feat = nn.relu(conv(name=f"cls_conv{i}")(cls_feat))
            reg_feat = nn.relu(conv(name=f"reg_conv{i}")(reg_feat))
        cls_score = nn.Conv(
            self.num_anchors * self.num_classes,
            (3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            bias_init=focal_bias_init(0.01),
            dtype=self.dtype,
            name="retina_cls",
        )(cls_feat)
        bbox_pred = nn.Conv(
            self.num_anchors * 4,
            (3, 3),
            padding=((1, 1), (1, 1)),
            kernel_init=nn.initializers.normal(0.01),
            dtype=self.dtype,
            name="retina_reg",
        )(reg_feat)
        return cls_score, bbox_pred


class RetinaNet(nn.Module):
    """Backbone + FPN + RetinaHead; returns per-level (cls, reg) maps.

    Variable scopes are {backbone, neck, bbox_head} — exactly the layout
    ckpt.detect_convert.convert_mmdet_state_dict produces, so a converted
    mmdet RetinaNet checkpoint applies without re-keying.
    """

    layers: Sequence[int] = (3, 4, 6, 3)
    num_classes: int = 80
    fpn_out_channels: int = 256
    stacked_convs: int = 4
    scales_per_octave: int = 3
    ratios: Sequence[float] = (0.5, 1.0, 2.0)
    dtype: Any = jnp.float32
    remat: bool = False  # rematerialize backbone blocks in backward

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        from mrla_tpu.detect.fpn import FPN
        from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight

        c_feats = ResNetMRLALight(
            layers=list(self.layers),
            features_only=True,
            use_drop_path=False,  # mmdet epilogue has no DropPath
            dtype=self.dtype,
            remat=self.remat,
            name="backbone",
        )(x, train)
        feats = FPN(
            out_channels=self.fpn_out_channels,
            num_outs=5,
            start_level=1,  # retinanet preset: P3..P7
            add_extra_convs="on_input",
            dtype=self.dtype,
            name="neck",
        )(c_feats)
        head = RetinaHead(
            num_classes=self.num_classes,
            feat_channels=self.fpn_out_channels,
            stacked_convs=self.stacked_convs,
            num_anchors=num_base_anchors(self.scales_per_octave, self.ratios),
            dtype=self.dtype,
            name="bbox_head",
        )
        return tuple(head(f) for f in feats)


def get_bboxes(
    level_outputs: Sequence[Tuple[jax.Array, jax.Array]],
    img_shape: Tuple[int, int],
    strides: Sequence[int] = (8, 16, 32, 64, 128),
    octave_base_scale: float = 4.0,
    scales_per_octave: int = 3,
    ratios: Sequence[float] = (0.5, 1.0, 2.0),
    nms_pre: int = 1000,
    score_thr: float = 0.05,
    iou_threshold: float = 0.5,
    max_per_img: int = 100,
    target_means=(0.0, 0.0, 0.0, 0.0),
    target_stds=(1.0, 1.0, 1.0, 1.0),
):
    """Decode head outputs into final detections (mmdet test_cfg path).

    level_outputs: per level (cls_score [B,H,W,A*C], bbox_pred [B,H,W,A*4]).
    Per level: sigmoid scores, keep the nms_pre anchors with the best
    max-class score, decode their deltas on the level's anchors (clipped to
    ``img_shape``); then class-wise NMS across levels.

    Returns (boxes [B, max_per_img, 4], scores [B, max_per_img],
    labels [B, max_per_img] int32, valid [B, max_per_img] bool).
    """
    # Fusing the detector forward and this decode into ONE XLA program
    # faults the TPU compiler at COCO shapes (worker crash, observed on
    # v5e 2026-08-18); the barrier pins the head outputs as materialized
    # values and costs nothing.
    level_outputs = jax.lax.optimization_barrier(tuple(level_outputs))
    # strides follow the used pyramid levels: retinanet preset serves P3..P7
    strides = strides[: len(level_outputs)]
    featmap_sizes = [c.shape[1:3] for c, _ in level_outputs]
    anchors = pyramid_anchors(
        featmap_sizes, strides, octave_base_scale, scales_per_octave, ratios
    )

    def one_image(per_level):
        cand_boxes, cand_scores = [], []
        for (cls_map, reg_map), anc in zip(per_level, anchors):
            h, w, ac = cls_map.shape
            a = anc.shape[0] // (h * w)  # anchors per cell
            num_c = ac // a
            scores = jax.nn.sigmoid(
                cls_map.reshape(-1, num_c).astype(jnp.float32)
            )  # [HWA, C]
            deltas = reg_map.reshape(-1, 4).astype(jnp.float32)
            anc = jnp.asarray(anc)
            n = scores.shape[0]
            if n > nms_pre:
                top = jax.lax.top_k(jnp.max(scores, axis=1), nms_pre)[1]
                scores, deltas, anc = scores[top], deltas[top], anc[top]
            boxes = delta2bbox(
                anc, deltas, target_means, target_stds, max_shape=img_shape
            )
            cand_boxes.append(boxes)
            cand_scores.append(scores)
        return multiclass_nms_fixed(
            jnp.concatenate(cand_boxes, 0),
            jnp.concatenate(cand_scores, 0),
            score_thr,
            iou_threshold,
            max_per_img,
        )

    return jax.vmap(one_image)(level_outputs)
