#!/usr/bin/env python
"""Real-chip EfficientNet-recipe smoke: RMSpropTF + exponential decay +
warmup through train/cli.py (the README.md:100-103 recipe family:
"RMSpropTF lr .048, decay .97 every 2.4 epochs, AMP" — bf16 here) on the
learnable synthetic task, efficientnet_mrlal_b0.

With the DeiT smoke (train_smoke_deit_tpu.py, AdamW family) and the
resnet smoke (train_smoke_tpu.py, SGD family) this covers all three
reference optimizer recipes on hardware.

Usage: python scripts/train_smoke_effnet_tpu.py [epochs=4 steps=80]

(4x80 and not the DeiT smoke's 2x50: the MBConv net fits the train set by
step ~100 but the BN running stats / RMSprop second-moment estimates need
another ~epoch before val tracks train — 2x40 reads 32% val while train
loss is already 0.02; 4x80 reaches 100% by epoch 2.  Measured on v5e.)
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from mrla_tpu.train import cli

    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    steps = int(sys.argv[2]) if len(sys.argv) > 2 else 80

    with tempfile.TemporaryDirectory() as out:
        result = cli.main([
            "-a", "efficientnet_mrlal_b0",
            "--data", "synthetic-learnable",
            "--num-classes", "10",
            "--image-size", "96",
            "-b", "128",
            "--epochs", str(epochs),
            "--synthetic-steps", str(steps),
            "--opt", "rmsproptf",
            "--lr", "0.016",
            "--scheduler", "exp",
            "--warmup-epochs", "1",
            "--wd", "1e-5",
            "--drop-path", "0.1",
            "--bf16",
            "--output-dir", out,
        ])
        print("smoke result:", result)
        acc1 = result["best_acc1"]
        assert acc1 > 60.0, f"rmsproptf recipe failed to learn: acc1={acc1}"
        print(f"OK: EfficientNet RMSpropTF recipe learns on-chip "
              f"(val acc@1 {acc1:.1f})")


if __name__ == "__main__":
    main()
