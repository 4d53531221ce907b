#!/usr/bin/env python
"""Real-chip FULL-RECIPE training smoke (VERDICT r2 next-6): the DeiT/timm
recipe — AdamW + cosine + warmup + EMA + Mixup/CutMix + label smoothing +
random erasing + clip-grad + bf16 — through the ACTUAL train/cli.py on the
learnable synthetic class-template task (deit/main.py:297-436 surface; the
round-2 smoke covered only SGD+mrlal).

Asserts: finite losses throughout, final val acc@1 (EMA-eval — ema_decay>0
routes eval through ema_params/ema_batch_stats) well above chance.

Usage: python scripts/train_smoke_deit_tpu.py [epochs=2 steps_per_epoch=50]
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mrla_tpu.train import cli

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 50

    with tempfile.TemporaryDirectory() as out:
        argv = [
            "-a", "deit_mrlal_tiny_patch16_224",
            "--data", "synthetic-learnable",
            "--num-classes", "10",
            "--image-size", "96",
            "-b", "128",
            "--epochs", str(epochs),
            "--synthetic-steps", str(steps),
            "--opt", "adamw",
            "--lr", "1e-3",
            "--scheduler", "cosine",
            "--warmup-epochs", "1",
            "--wd", "0.05",
            "--clip-grad", "5.0",
            "--label-smooth", "0.1",
            "--mixup", "0.2",
            "--cutmix", "0.2",
            "--random-erase", "0.1",
            "--ema-decay", "0.9",
            "--drop-path", "0.05",
            "--bf16",
            "--output-dir", out,
        ]
        result = cli.main(argv)
        print("smoke result:", result)
        acc1 = result["best_acc1"] if "best_acc1" in result else result["acc1"]
        assert acc1 > 60.0, f"full-recipe trainer failed to learn: acc1={acc1}"
        print(f"OK: full DeiT recipe learns on-chip (EMA-eval acc@1 {acc1:.1f})")


if __name__ == "__main__":
    main()
