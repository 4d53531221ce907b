"""Serving CLI e2e: tiny ImageFolder -> engine-routed eval -> JSON result.

Counterpart of the reference's `train.py -e` eval mode, but through the
optimized serving engines."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from mrla_tpu.serving.cli import main


@pytest.fixture()
def tiny_imagefolder(tmp_path):
    rng = np.random.default_rng(0)
    for cls in ("class_a", "class_b"):
        d = tmp_path / "val" / cls
        d.mkdir(parents=True)
        for i in range(5):
            arr = rng.integers(0, 255, (80, 80, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"{i}.jpg")
    return str(tmp_path)


def test_cli_mrlal_random_weights(tiny_imagefolder, capsys):
    res = main([
        "-a", "resnet50_mrlal", "--data", tiny_imagefolder,
        "-b", "4", "--image-size", "64", "--num-classes", "2",
        "--workers", "2",
    ])
    assert res["engine"] == "mrlal"
    assert res["images"] == 10  # ragged final batch included, padding masked
    assert 0.0 <= res["acc1"] <= 100.0 and res["acc5"] == 100.0  # 2 classes
    out = capsys.readouterr().out.strip().splitlines()[-1]
    assert json.loads(out)["arch"] == "resnet50_mrlal"


def test_cli_engine_routing():
    from mrla_tpu.serving.cli import _pick_engine

    assert _pick_engine("resnet50_mrlal") == "mrlal"
    assert _pick_engine("resnet101_mrlal") == "mrlal"
    assert _pick_engine("resnet50_mrlab") == "mrlab"
    assert _pick_engine("resnet50_mrlab22") == "mrlab"
    assert _pick_engine("deit_mrlal_tiny_patch16_224") == "precast"
    assert _pick_engine("efficientnet_mrlal_b0") == "precast"


def test_cli_precast_microbatch_default():
    """Non-DeiT precast archs default to the unsplit program (chains lose
    without a GAP barrier to hide); DeiTs keep the engine's mb16."""
    from mrla_tpu.serving.cli import _precast_microbatch_default

    assert _precast_microbatch_default("efficientnet_mrlal_b0") == {
        "microbatch": 0
    }
    assert _precast_microbatch_default("resmlp_24") == {"microbatch": 0}
    assert _precast_microbatch_default("patchconvnet_s60") == {"microbatch": 0}
    assert _precast_microbatch_default("deit_mrlal_small_patch16_224") == {}


def test_cli_precast_engine(tiny_imagefolder):
    res = main([
        "-a", "efficientnet_mrlal_b0", "--data", tiny_imagefolder,
        "-b", "4", "--image-size", "64", "--num-classes", "2",
        "--workers", "2", "--limit", "6",
    ])
    assert res["engine"] == "precast"
    assert res["images"] == 6


def test_cli_quant_int8(tiny_imagefolder):
    """--quant int8 routes to the PTQ engine (calibrated on the first eval
    batch) and still evaluates every image."""
    res = main([
        "-a", "resnet50_mrlal", "--data", tiny_imagefolder,
        "-b", "4", "--image-size", "64", "--num-classes", "2",
        "--workers", "2", "--quant", "int8", "--limit", "6",
    ])
    assert res["engine"] == "mrlal"
    assert res["images"] == 6


def test_cli_quant_rejected_off_mrlal():
    import pytest as _pytest

    from mrla_tpu.serving.cli import make_engine_forward

    with _pytest.raises(ValueError, match="mrlal engine only"):
        make_engine_forward("resnet50", None, None, engine="precast",
                            quant="int8", calib_x=object())


def test_cli_resume_from_orbax_run(tiny_imagefolder, tmp_path):
    """Train briefly with the train CLI, then evaluate the saved orbax
    checkpoint through the serving CLI's --resume path."""
    from mrla_tpu.train.cli import main as train_main

    run_dir = str(tmp_path / "run")
    train_main([
        "-a", "resnet50_mrlal", "--data", "synthetic", "--epochs", "1",
        "--synthetic-steps", "2", "--batch-size", "8", "--image-size", "64",
        "--num-classes", "2", "--output-dir", run_dir,
    ])

    res = main([
        "-a", "resnet50_mrlal", "--data", tiny_imagefolder,
        "-b", "4", "--image-size", "64", "--num-classes", "2",
        "--workers", "2", "--resume", run_dir, "--limit", "4",
    ])
    assert res["images"] == 4 and res["engine"] == "mrlal"


def test_cli_mrlab_engine(tiny_imagefolder):
    res = main([
        "-a", "resnet50_mrlab", "--data", tiny_imagefolder,
        "-b", "4", "--image-size", "64", "--num-classes", "2",
        "--workers", "2", "--limit", "4",
    ])
    assert res["engine"] == "mrlab"
    assert res["images"] == 4
