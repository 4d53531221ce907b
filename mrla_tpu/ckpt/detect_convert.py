"""MMDetection checkpoint -> detection tree converter.

The reference ships detection via upstream MMDetection: a trained detector
checkpoint holds `backbone.*` keys (the ResNet_mrlal trunk,
mmdetection/mmdet/models/backbones/resnet_mrlal.py) and `neck.*` keys
(mmdet FPN: `neck.lateral_convs.{i}.conv.{weight,bias}` and
`neck.fpn_convs.{i}.conv.{weight,bias}`, where fpn_convs indices >= the
lateral count are the retinanet-style extra convs).  This converts both
into the MRLABackboneFPN variable tree (detect/backbone.py + detect/fpn.py)
so a user can serve features from a real mmdet-trained model; head keys
(rpn_head/roi_head/bbox_head) are outside the export scope (SURVEY §3.5)
and ignored.

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
