"""MMDetection checkpoint -> detection tree converter.

The reference ships detection via upstream MMDetection: a trained detector
checkpoint holds `backbone.*` keys (the ResNet_mrlal trunk,
mmdetection/mmdet/models/backbones/resnet_mrlal.py) and `neck.*` keys
(mmdet FPN: `neck.lateral_convs.{i}.conv.{weight,bias}` and
`neck.fpn_convs.{i}.conv.{weight,bias}`, where fpn_convs indices >= the
lateral count are the retinanet-style extra convs).  This converts both
into the MRLABackboneFPN variable tree (detect/backbone.py + detect/fpn.py)
so a user can serve features from a real mmdet-trained model.  Head keys
also convert: single-stage ``bbox_head.*`` (RetinaHead) via
convert_mmdet_state_dict, and the full two-stage tree (rpn_head /
roi_head.bbox_head / roi_head.mask_head) via convert_mmdet_two_stage.

Conventions: conv kernels transpose OIHW -> HWIO; backbone conversion
reuses ckpt.convert_resnet_state_dict (same trunk naming as the
classification family).
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

from mrla_tpu.ckpt.torch_convert import convert_resnet_state_dict


def _np(v) -> np.ndarray:
    return np.asarray(v.detach().cpu().numpy() if hasattr(v, "detach") else v)


def _convert_retina_head(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """bbox_head.* keys (mmdet RetinaHead) -> detect/retinanet.RetinaHead tree.

    Key layout upstream: ``bbox_head.{cls,reg}_convs.{i}.conv.{weight,bias}``
    (ConvModule, no norm in the retinanet preset) and
    ``bbox_head.retina_{cls,reg}.{weight,bias}``.  Output-channel order of
    retina_cls/retina_reg is (A, K) anchor-major — identical on both sides
    (see detect/retinanet.py channel-layout contract), so a plain
    OIHW->HWIO transpose preserves semantics."""
    head: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        if not k.startswith("bbox_head."):
            continue
        parts = k.split(".")
        if parts[1] in ("cls_convs", "reg_convs") and parts[3] == "conv":
            name = f"{parts[1][:3]}_conv{int(parts[2])}"
            leaf = parts[4]
        elif parts[1] in ("retina_cls", "retina_reg"):
            name = parts[1]
            leaf = parts[2]
        else:
            raise ValueError(f"unrecognized bbox_head key: {k}")
        arr = _np(v)
        entry = head.setdefault(name, {})
        if leaf == "weight":
            entry["kernel"] = np.transpose(arr, (2, 3, 1, 0))  # OIHW->HWIO
        elif leaf == "bias":
            entry["bias"] = arr
        else:
            raise ValueError(f"unrecognized bbox_head param: {k}")
    return head


def _convert_rpn_head(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """rpn_head.* keys (mmdet RPNHead: rpn_conv / rpn_cls / rpn_reg plain
    Conv2d) -> detect/two_stage.RPNHead tree."""
    head: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        if not k.startswith("rpn_head."):
            continue
        _, name, leaf = k.split(".")
        if name not in ("rpn_conv", "rpn_cls", "rpn_reg"):
            raise ValueError(f"unrecognized rpn_head key: {k}")
        arr = _np(v)
        entry = head.setdefault(name, {})
        if leaf == "weight":
            entry["kernel"] = np.transpose(arr, (2, 3, 1, 0))  # OIHW->HWIO
        elif leaf == "bias":
            entry["bias"] = arr
        else:
            raise ValueError(f"unrecognized rpn_head param: {k}")
    return head


def _convert_bbox_head(
    state_dict: Mapping[str, Any], roi_feat_size: int = 7
) -> Dict[str, Dict]:
    """roi_head.bbox_head.* (mmdet Shared2FCBBoxHead) ->
    detect/two_stage.Shared2FCBBoxHead tree.

    The first shared fc consumes the FLATTENED RoI features; torch
    flattens [C, 7, 7] channel-major while our NHWC head flattens
    [7, 7, C] — its weight is re-indexed ([O, C·49] -> reshape
    [O, C, 7, 7] -> transpose -> [49·C, O]), not just transposed.
    Later fcs are plain [O, I] -> [I, O] transposes."""
    head: Dict[str, Dict[str, np.ndarray]] = {}
    pre = "roi_head.bbox_head."
    s = roi_feat_size
    for k, v in state_dict.items():
        if not k.startswith(pre):
            continue
        parts = k[len(pre):].split(".")
        arr = _np(v)
        if parts[0] == "shared_fcs":
            name = f"shared_fc{int(parts[1])}"
            leaf = parts[2]
            first = int(parts[1]) == 0
        elif parts[0] in ("fc_cls", "fc_reg"):
            name, leaf, first = parts[0], parts[1], False
        else:
            raise ValueError(f"unrecognized bbox_head key: {k}")
        entry = head.setdefault(name, {})
        if leaf == "bias":
            entry["bias"] = arr
        elif first:
            o, i = arr.shape
            c = i // (s * s)
            entry["kernel"] = (
                arr.reshape(o, c, s, s)
                .transpose(2, 3, 1, 0)
                .reshape(s * s * c, o)
            )
        else:
            entry["kernel"] = arr.T
    return head


def _convert_mask_head(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """roi_head.mask_head.* (mmdet FCNMaskHead) ->
    detect/two_stage.FCNMaskHead tree.  ``upsample`` is a ConvTranspose2d
    whose torch weight is [in, out, kh, kw] -> flax (kh, kw, in, out)."""
    head: Dict[str, Dict[str, np.ndarray]] = {}
    pre = "roi_head.mask_head."
    for k, v in state_dict.items():
        if not k.startswith(pre):
            continue
        parts = k[len(pre):].split(".")
        arr = _np(v)
        if parts[0] == "convs" and parts[2] == "conv":
            name, leaf = f"conv{int(parts[1])}", parts[3]
            kernel = lambda a: np.transpose(a, (2, 3, 1, 0))  # OIHW->HWIO
        elif parts[0] == "upsample":
            name, leaf = "upsample", parts[1]
            # torch ConvTranspose2d scatters the kernel as-is; flax
            # ConvTranspose runs a correlation on the zero-stuffed input,
            # so the spatial taps flip: IOHW -> HWIO + rot180 (verified
            # against torch in tests/test_two_stage_convert.py)
            kernel = lambda a: np.ascontiguousarray(
                np.transpose(a, (2, 3, 0, 1))[::-1, ::-1]
            )
        elif parts[0] == "conv_logits":
            name, leaf = "conv_logits", parts[1]
            kernel = lambda a: np.transpose(a, (2, 3, 1, 0))
        else:
            raise ValueError(f"unrecognized mask_head key: {k}")
        entry = head.setdefault(name, {})
        if leaf == "weight":
            entry["kernel"] = kernel(arr)
        elif leaf == "bias":
            entry["bias"] = arr
        else:
            raise ValueError(f"unrecognized mask_head param: {k}")
    return head


def convert_mmdet_two_stage(state_dict: Mapping[str, Any]) -> Dict[str, Dict]:
    """Full Faster/Mask R-CNN state_dict -> detect/two_stage variable tree
    {"params": {backbone, neck, rpn_head, bbox_head[, mask_head]},
    "batch_stats": {backbone}} — drops into FasterRCNN/MaskRCNN.apply."""
    base = convert_mmdet_state_dict(state_dict, num_laterals=4)
    params = base["params"]
    rpn = _convert_rpn_head(state_dict)
    if not rpn:
        raise ValueError("no rpn_head.* keys — not a two-stage checkpoint?")
    params["rpn_head"] = rpn
    params["bbox_head"] = _convert_bbox_head(state_dict)
    mask = _convert_mask_head(state_dict)
    if mask:
        params["mask_head"] = mask
    return base


def convert_mmdet_state_dict(
    state_dict: Mapping[str, Any], num_laterals: int = 4
) -> Dict[str, Dict]:
    """Full detector state_dict -> {"params": {"backbone", "neck"
    [, "bbox_head"]}, "batch_stats": {"backbone"}}.

    num_laterals: lateral conv count (= pyramid depth used by the neck;
    4 for the faster/mask presets, 3 for retinanet's start_level=1).
    fpn_convs past num_laterals map to extra_conv{i} (retinanet
    add_extra_convs).  RetinaHead keys (bbox_head.*) convert when present;
    two-stage heads (rpn_head/roi_head) remain out of scope."""
    backbone_sd = {
        k[len("backbone."):]: v
        for k, v in state_dict.items()
        if k.startswith("backbone.")
    }
    if not backbone_sd:
        raise ValueError("no backbone.* keys — not an mmdet checkpoint?")
    trunk = convert_resnet_state_dict(backbone_sd)

    neck: Dict[str, Dict[str, np.ndarray]] = {}
    for k, v in state_dict.items():
        if not k.startswith("neck."):
            continue
        parts = k.split(".")  # neck, lateral_convs|fpn_convs, i, conv, w/b
        if len(parts) != 5 or parts[3] != "conv":
            raise ValueError(f"unrecognized neck key: {k}")
        idx = int(parts[2])
        if parts[1] == "lateral_convs":
            name = f"lateral{idx}"
        elif parts[1] == "fpn_convs":
            name = (
                f"fpn_conv{idx}" if idx < num_laterals else f"extra_conv{idx}"
            )
        else:
            raise ValueError(f"unrecognized neck module: {k}")
        arr = _np(v)
        entry = neck.setdefault(name, {})
        if parts[4] == "weight":
            entry["kernel"] = np.transpose(arr, (2, 3, 1, 0))  # OIHW->HWIO
        elif parts[4] == "bias":
            entry["bias"] = arr
        else:
            raise ValueError(f"unrecognized neck param: {k}")

    params: Dict[str, Dict] = {"backbone": trunk["params"], "neck": neck}
    head = _convert_retina_head(state_dict)
    if head:
        params["bbox_head"] = head
    return {
        "params": params,
        "batch_stats": {"backbone": trunk["batch_stats"]},
    }
