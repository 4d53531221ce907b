"""Dry run of docs/RUNBOOK.md (VERDICT r3 #9): the one-command
published-checkpoint flows, exercised end to end on locally-saved
EXECUTED-reference state dicts (no egress: random weights, real format).

Covers exactly the two runbook commands:

  * ImageNet top-1:  serving.cli -a resnet50_mrlal --torch ckpt.pth.tar
  * COCO mAP:        detect.train_cli --preset faster_rcnn... --torch
                     ckpt.pth --eval-only

Each state dict is produced by torch code with the reference's exact key
layout (classification: the executed reference model itself,
resnet/models/resnet_mrla_light.py; detection: mmdet checkpoint naming
per configs/_base_/models/faster_rcnn_r50mrlal_fpn.py), saved with
torch.save({"state_dict": ...}) the way the published .pth.tar files are.
"""

import json
import sys
import types

import numpy as np
import pytest
import torch

# same import shim as test_resnet_parity: the reference package __init__
# star-imports a module with a missing symbol, so register the package
# path without executing its __init__
if "models" not in sys.modules or not getattr(
    sys.modules.get("models"), "__path__", None
):
    sys.path.insert(0, "/root/reference/resnet")
    _pkg = types.ModuleType("models")
    _pkg.__path__ = ["/root/reference/resnet/models"]
    sys.modules["models"] = _pkg


@pytest.fixture()
def tiny_imagefolder(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for cls in ("class_a", "class_b"):
        d = tmp_path / "data" / "val" / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = rng.integers(0, 255, (72, 72, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(tmp_path / "data")


@pytest.mark.slow
def test_runbook_classification_torch_to_top1(tmp_path, tiny_imagefolder):
    """RUNBOOK step: .pth.tar -> serving.cli top-1, one command."""
    from models.resnet_mrla_light import resnet50_mrlal  # reference, executed

    from mrla_tpu.serving.cli import main

    torch.manual_seed(0)
    tm = resnet50_mrlal(num_classes=2)
    ckpt = tmp_path / "r50_mrlal_ref.pth.tar"
    # the published files store {'state_dict': ...} (+ optimizer etc.)
    torch.save({"state_dict": tm.state_dict(), "epoch": 100}, ckpt)

    res = main([
        "-a", "resnet50_mrlal", "--data", tiny_imagefolder,
        "--torch", str(ckpt),
        "-b", "4", "--image-size", "64", "--num-classes", "2",
        "--workers", "2",
    ])
    assert res["engine"] == "mrlal"
    assert res["images"] == 6
    assert 0.0 <= res["acc1"] <= 100.0


def _mmdet_faster_rcnn_state_dict(num_classes=2):
    """Full mmdet-format Faster R-CNN state dict: backbone.* from the
    EXECUTED reference ResNet_mrlal (mmdetection/mmdet/models/backbones/
    resnet_mrlal.py key layout == resnet/models/resnet_mrla_light.py) +
    neck / rpn_head / roi_head.bbox_head in mmdet checkpoint naming."""
    from tests.mmcv_shim import load_reference_backbone

    ref = load_reference_backbone()
    torch.manual_seed(3)
    tm = ref.ResNet_mrlal(layers=[1, 1, 1, 1])
    sd = {f"backbone.{k}": v for k, v in tm.state_dict().items()}
    g = torch.Generator().manual_seed(4)

    def rand(*shape, scale=0.05):
        return torch.randn(shape, generator=g) * scale

    in_ch = [256, 512, 1024, 2048]
    for i in range(4):
        sd[f"neck.lateral_convs.{i}.conv.weight"] = rand(256, in_ch[i], 1, 1)
        sd[f"neck.lateral_convs.{i}.conv.bias"] = rand(256)
        sd[f"neck.fpn_convs.{i}.conv.weight"] = rand(256, 256, 3, 3)
        sd[f"neck.fpn_convs.{i}.conv.bias"] = rand(256)
    sd["rpn_head.rpn_conv.weight"] = rand(256, 256, 3, 3)
    sd["rpn_head.rpn_conv.bias"] = rand(256)
    sd["rpn_head.rpn_cls.weight"] = rand(3, 256, 1, 1)
    sd["rpn_head.rpn_cls.bias"] = rand(3)
    sd["rpn_head.rpn_reg.weight"] = rand(12, 256, 1, 1)
    sd["rpn_head.rpn_reg.bias"] = rand(12)
    sd["roi_head.bbox_head.shared_fcs.0.weight"] = rand(1024, 256 * 49,
                                                        scale=0.01)
    sd["roi_head.bbox_head.shared_fcs.0.bias"] = rand(1024)
    sd["roi_head.bbox_head.shared_fcs.1.weight"] = rand(1024, 1024,
                                                        scale=0.01)
    sd["roi_head.bbox_head.shared_fcs.1.bias"] = rand(1024)
    sd["roi_head.bbox_head.fc_cls.weight"] = rand(num_classes + 1, 1024)
    sd["roi_head.bbox_head.fc_cls.bias"] = rand(num_classes + 1)
    sd["roi_head.bbox_head.fc_reg.weight"] = rand(num_classes * 4, 1024)
    sd["roi_head.bbox_head.fc_reg.bias"] = rand(num_classes * 4)
    return sd


@pytest.mark.slow
def test_runbook_detection_torch_to_map(tmp_path):
    """RUNBOOK step: mmdet .pth -> detect.train_cli --eval-only mAP,
    one command (12-stat COCOeval schema in the output)."""
    from tests.test_detect_cli import _write_tiny_coco

    from mrla_tpu.detect.train_cli import main as cli_main

    sd = _mmdet_faster_rcnn_state_dict(num_classes=2)
    ckpt = tmp_path / "faster_rcnn_r50mrlal_ref.pth"
    torch.save({"state_dict": sd, "meta": {"epoch": 12}}, ckpt)

    ann, imgs = _write_tiny_coco(tmp_path)
    out = cli_main([
        "--preset", "faster_rcnn_r50mrlal_fpn_1x_coco",
        "--data", "coco",
        "--train-ann", ann, "--train-imgs", imgs,
        "--backbone-layers", "1", "1", "1", "1",
        "--img-size", "96",
        "--num-classes", "2",
        "--max-gt", "4",
        "--batch-size", "2",
        "--rpn-proposals", "50",
        "--torch", str(ckpt),
        "--eval-only",
        "--output-dir", str(tmp_path / "run"),
    ])
    for key in ("mAP", "AP50", "mAP_s", "AR@100"):
        assert key in out and np.isfinite(out[key]), key


def test_runbook_doc_commands_reference_real_flags():
    """Every CLI flag the runbook quotes must actually exist (guards the
    doc against drift)."""
    import re
    from pathlib import Path

    from mrla_tpu.detect.train_cli import parse_args as detect_parse
    from mrla_tpu.serving.cli import build_argparser

    doc = Path(__file__).resolve().parent.parent / "docs" / "RUNBOOK.md"
    text = doc.read_text()
    serving_flags = {
        a for act in build_argparser()._actions for a in act.option_strings
    }
    # build detect parser without running it: parse a help-free minimal set
    detect_ns = detect_parse(["--output-dir", "x"])
    detect_flags = {
        "--" + k.replace("_", "-") for k in vars(detect_ns)
    }
    for block in re.findall(r"```bash\n(.*?)```", text, re.S):
        if "serving.cli" in block:
            for flag in re.findall(r"(--[a-z0-9-]+)", block):
                assert flag in serving_flags, flag
        elif "detect.train_cli" in block:
            for flag in re.findall(r"(--[a-z0-9-]+)", block):
                assert flag in detect_flags, flag
