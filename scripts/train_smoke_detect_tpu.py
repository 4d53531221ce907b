#!/usr/bin/env python
"""Real-chip DETECTION training smoke: the full RetinaNet recipe —
MaxIoU assignment -> focal+L1 -> SGD with the 1x warmup/step schedule ->
decode/NMS -> COCO-style mAP eval — through the ACTUAL
detect/train_cli.py on the learnable synthetic-squares task (the native
counterpart of the reference's `tools/train.py retinanet_*_1x_coco.py`
workload, README.md:82-92).

Measured on the v5e chip (2026-08-18, tiny 1-1-1-1 backbone, 128px bs8,
lr 5e-3): AP50 0.95 / mAP 0.76 by epoch 7, with the x0.1 step decay
firing on schedule at epoch 8.  From-scratch note: mmdet's lr 0.02
assumes a PRETRAINED backbone; random-init diverges there (NaN-abort
fires as designed) — 5e-3 is the from-scratch setting.

Asserts: finite losses throughout, final AP50 >= 0.7.

Usage: python scripts/train_smoke_detect_tpu.py [epochs=7]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mrla_tpu.detect.train_cli import main as cli_main

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 7

    with tempfile.TemporaryDirectory() as out:
        cli_main([
            "--preset", "retinanet_r50mrlal_fpn_1x_coco",
            "--data", "synthetic-detect",
            "--backbone-layers", "1", "1", "1", "1",
            "--img-size", "128",
            "--num-classes", "3",
            "--max-gt", "4",
            "--batch-size", "8",
            "--epochs", str(epochs),
            "--steps-per-epoch", "150",
            "--eval-steps", "3",
            "--warmup-iters", "100",
            "--lr", "0.005",
            "--output-dir", out,
        ])
        lines = [
            json.loads(l)
            for l in open(os.path.join(out, "log.jsonl"))
        ]
    for rec in lines:
        assert all(
            rec[k] == rec[k] for k in ("loss", "loss_cls", "loss_bbox")
        ), f"non-finite loss: {rec}"
    final = lines[-1]
    print("final:", json.dumps(final))
    assert final["AP50"] >= 0.7, f"AP50 {final['AP50']} < 0.7"
    print("RETINANET SMOKE PASSED")

    if "--two-stage" in sys.argv:
        # faster_rcnn LEARNING on hardware: RPN NMS + RandomSampler +
        # RoIAlign + class-specific regression converge end to end.
        # Measured (v5e, 2026-08-18): mAP .69/.84/.84 at epochs 3/4/5,
        # AP50 1.0 by epoch 4 (~12-16 s/epoch after compile).
        with tempfile.TemporaryDirectory() as out:
            cli_main([
                "--preset", "faster_rcnn_r50mrlal_fpn_1x_coco",
                "--data", "synthetic-detect",
                "--backbone-layers", "1", "1", "1", "1",
                "--img-size", "128",
                "--num-classes", "3",
                "--max-gt", "4",
                "--batch-size", "8",
                "--epochs", "5",
                "--steps-per-epoch", "150",
                "--eval-steps", "3",
                "--rpn-proposals", "100",
                "--rcnn-samples", "64",
                "--warmup-iters", "100",
                "--lr", "0.005",
                "--output-dir", out,
            ])
            rec = json.loads(
                open(os.path.join(out, "log.jsonl")).readlines()[-1]
            )
        for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls",
                  "loss_bbox"):
            assert rec[k] == rec[k], f"non-finite {k}: {rec}"
        print("two-stage:", json.dumps(rec))
        assert rec["AP50"] >= 0.7, f"AP50 {rec['AP50']} < 0.7"
        print("TWO-STAGE SMOKE PASSED")


if __name__ == "__main__":
    main()
