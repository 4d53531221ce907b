"""Fine-tune path: pretrain ckpt -> new head + new token grid (CLI surface)."""

import jax
import pytest

from mrla_tpu.train.cli import main


@pytest.mark.slow
def test_finetune_new_head_and_grid(tmp_path):
    pre = str(tmp_path / "pre")
    run = str(tmp_path / "run")
    main(["-a", "deit_tiny_patch16_224", "--data", "synthetic",
          "--num-classes", "10", "--image-size", "96", "--batch-size", "8",
          "--epochs", "1", "--synthetic-steps", "2", "--opt", "adamw",
          "--lr", "1e-3", "--output-dir", pre, "--print-freq", "10"])
    res = main(["-a", "deit_tiny_patch16_224", "--data", "synthetic",
                "--num-classes", "5", "--image-size", "128",
                "--batch-size", "8", "--epochs", "1", "--synthetic-steps", "2",
                "--opt", "adamw", "--lr", "1e-4", "--finetune", pre,
                "--output-dir", run, "--print-freq", "10"])
    assert res["history"], "finetune epoch did not run"
