"""Detection subsystem: MRLA backbone pyramid, FPN neck, and RetinaNet.

The feature export (backbone + FPN, the BASELINE.json scope) feeds any
downstream detector; detect/retinanet.py additionally completes the
reference's RetinaNet graft natively (head + anchors + decode + NMS) so
the retinanet_r50mrlal_fpn_1x_coco preset runs end-to-end on TPU.
"""

from mrla_tpu.detect.fpn import FPN
from mrla_tpu.detect.backbone import (
    MRLABackboneFPN,
    freeze_mask,
    load_backbone_from_classification,
)
from mrla_tpu.detect.anchors import (
    base_anchors,
    grid_anchors,
    num_base_anchors,
    pyramid_anchors,
)
from mrla_tpu.detect.bbox import (
    bbox2delta,
    bbox_overlaps,
    delta2bbox,
    multiclass_nms_fixed,
    nms_fixed,
    soft_nms_fixed,
)
from mrla_tpu.detect.retinanet import RetinaHead, RetinaNet, get_bboxes
from mrla_tpu.detect.targets import anchor_targets, max_iou_assign
from mrla_tpu.detect.losses import retinanet_loss, sigmoid_focal_loss
from mrla_tpu.detect.roi_align import (
    batched_roi_align,
    map_roi_levels,
    roi_align_multilevel,
)
from mrla_tpu.detect.two_stage import (
    FasterRCNN,
    FCNMaskHead,
    MaskRCNN,
    RPNHead,
    Shared2FCBBoxHead,
    init_detector,
    rcnn_detections,
    rpn_proposals,
    two_stage_predict,
)
from mrla_tpu.detect.coco_eval import evaluate_detections, paste_masks
from mrla_tpu.detect.two_stage_train import (
    faster_rcnn_train_loss,
    mask_loss,
    random_sample,
    rcnn_loss,
    rcnn_targets,
    rpn_loss,
)

__all__ = [
    "FPN",
    "MRLABackboneFPN",
    "freeze_mask",
    "load_backbone_from_classification",
    "base_anchors",
    "grid_anchors",
    "num_base_anchors",
    "pyramid_anchors",
    "bbox2delta",
    "bbox_overlaps",
    "delta2bbox",
    "multiclass_nms_fixed",
    "nms_fixed",
    "soft_nms_fixed",
    "RetinaHead",
    "RetinaNet",
    "get_bboxes",
    "anchor_targets",
    "max_iou_assign",
    "retinanet_loss",
    "sigmoid_focal_loss",
    "batched_roi_align",
    "map_roi_levels",
    "roi_align_multilevel",
    "FasterRCNN",
    "FCNMaskHead",
    "MaskRCNN",
    "RPNHead",
    "Shared2FCBBoxHead",
    "init_detector",
    "rcnn_detections",
    "rpn_proposals",
    "two_stage_predict",
    "faster_rcnn_train_loss",
    "mask_loss",
    "random_sample",
    "rcnn_loss",
    "rcnn_targets",
    "rpn_loss",
    "evaluate_detections",
    "paste_masks",
]
