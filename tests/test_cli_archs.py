"""CLI rng-wiring regression: archs with nonzero INTERNAL dropout/droppath
defaults must train through train/cli.py without explicit flags.

efficientnet_mrlal_b0 defaults drop_rate=0.2 (classifier dropout) and
deit_mrlab_* hardcodes drop_path_rate=0.1 (the reference dpr quirk); the
CLI used to key the PRNG wiring off its own --drop-rate/--drop-path flags
alone and crashed with InvalidRngError for these archs (caught by the
round-3 EfficientNet-recipe smoke)."""

import tempfile

import pytest


@pytest.mark.parametrize("arch,extra", [
    ("efficientnet_mrlal_b0", ["--opt", "rmsproptf", "--scheduler", "exp"]),
    ("deit_mrlab_tiny_patch16_224", ["--opt", "adamw", "--scheduler",
                                     "cosine"]),
])
def test_cli_internal_dropout_archs_train(arch, extra):
    from mrla_tpu.train import cli

    with tempfile.TemporaryDirectory() as out:
        result = cli.main([
            "-a", arch,
            "--data", "synthetic",
            "--num-classes", "8",
            "--image-size", "64",
            "-b", "8",  # conftest runs 8 virtual devices
            "--epochs", "1",
            "--synthetic-steps", "1",
            "--lr", "0.01",
            "--warmup-epochs", "1",
            "--output-dir", out,
        ] + extra)
        assert "best_acc1" in result
