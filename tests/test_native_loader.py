"""Native C++ JPEG loader: build, decode, determinism, PIL-path agreement."""

import glob
import os

import numpy as np
import pytest

from mrla_tpu.data import ImageFolder, iterate_batches
from mrla_tpu.data import native


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image

    root = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    for c in range(2):
        d = root / f"class_{c}"
        d.mkdir()
        for i in range(4):
            arr = rng.integers(0, 255, (60, 48, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img{i}.jpg", quality=95)
    return str(root)


def test_native_builds_and_decodes(jpeg_dir):
    assert native.available(), "native loader failed to build"
    paths = sorted(glob.glob(os.path.join(jpeg_dir, "*", "*.jpg")))
    out = native.decode_batch(paths, 32, train=False)
    assert out.shape == (8, 32, 32, 3) and out.dtype == np.uint8
    assert (out.sum(axis=(1, 2, 3)) > 0).all()


def test_native_train_determinism(jpeg_dir):
    paths = sorted(glob.glob(os.path.join(jpeg_dir, "*", "*.jpg")))
    a = native.decode_batch(paths, 32, train=True, seed=3)
    b = native.decode_batch(paths, 32, train=True, seed=3)
    c = native.decode_batch(paths, 32, train=True, seed=4)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_native_eval_close_to_pil(tmp_path):
    # smooth content isolates GEOMETRY agreement; on white noise PIL's
    # antialiased downsample and plain bilinear legitimately diverge.
    from PIL import Image

    d = tmp_path / "c0"
    d.mkdir()
    yy, xx = np.mgrid[0:60, 0:48]
    arr = np.stack([yy * 4, xx * 5, (yy + xx) * 2], -1).clip(0, 255).astype(np.uint8)
    Image.fromarray(arr).save(d / "a.jpg", quality=98)

    ds = ImageFolder(str(tmp_path))
    pil = ds.load_eval(0, 32).astype(np.float32)
    nat = native.decode_batch([ds.samples[0][0]], 32, train=False)[0].astype(
        np.float32
    )
    assert np.abs(pil - nat).mean() < 4.0
    assert np.abs(pil - nat).max() < 16.0


def test_iterate_batches_uses_native(jpeg_dir):
    ds = ImageFolder(jpeg_dir)
    batches = list(
        iterate_batches(ds, np.arange(8), 4, size=32, train=True, num_threads=2)
    )
    assert len(batches) == 2
    assert all(b["image"].shape == (4, 32, 32, 3) for b in batches)


def test_missing_file_zero_fills(jpeg_dir, tmp_path):
    paths = sorted(glob.glob(os.path.join(jpeg_dir, "*", "*.jpg")))[:2]
    paths.append(str(tmp_path / "missing.jpg"))
    with pytest.warns(UserWarning, match="2/3"):
        out = native.decode_batch(paths, 32, train=False)
    assert out[2].sum() == 0 and out[0].sum() > 0


def test_corrupt_jpeg_does_not_abort(jpeg_dir, tmp_path):
    """libjpeg's default error_exit calls exit(); the loader installs a
    longjmp handler so corrupt/truncated files zero-fill instead of killing
    the training process (ADVICE r1: loader.cc error handling)."""
    good = sorted(glob.glob(os.path.join(jpeg_dir, "*", "*.jpg")))[0]
    # SOI marker + garbage: passes fopen, dies inside the decoder
    bad_header = tmp_path / "bad_header.jpg"
    bad_header.write_bytes(b"\xff\xd8\xff\xe0" + b"\x00" * 64)
    # valid prefix, truncated body: dies mid-scanline
    data = open(good, "rb").read()
    truncated = tmp_path / "trunc.jpg"
    truncated.write_bytes(data[: len(data) // 3])

    with pytest.warns(UserWarning):
        out = native.decode_batch(
            [good, str(bad_header), str(truncated), good], 32, train=False,
            num_threads=2,
        )
    assert out.shape == (4, 32, 32, 3)
    assert out[0].sum() > 0 and out[3].sum() > 0
    assert out[1].sum() == 0  # zero-filled, not a crash
