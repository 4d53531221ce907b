"""Data pipeline tests: transforms, samplers, imagefolder loader."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mrla_tpu.data import (
    ImageFolder,
    center_crop_resize,
    distributed_indices,
    eval_transform_params,
    iterate_batches,
    mixup_cutmix,
    normalize,
    ra_sampler_indices,
    random_erasing,
    random_resized_crop_params,
    synthetic_batches,
)


def test_normalize_range():
    x = jnp.full((1, 4, 4, 3), 255.0)
    out = normalize(x)
    want = (1.0 - np.array([0.485, 0.456, 0.406])) / np.array([0.229, 0.224, 0.225])
    np.testing.assert_allclose(np.asarray(out)[0, 0, 0], want, rtol=1e-5)


def test_random_resized_crop_params_bounds():
    rng = np.random.default_rng(0)
    for _ in range(50):
        t, l, h, w = random_resized_crop_params(rng, 300, 400)
        assert 0 <= t and t + h <= 300
        assert 0 <= l and l + w <= 400


def test_eval_transform_params_matches_reference_rule():
    # deit/datasets.py:100-105: resize shorter side to int(224/0.875)=256
    rh, rw, top, left, c = eval_transform_params(480, 640, 224)
    assert (rh, c) == (256, 224) and rw == round(640 * 256 / 480)


def test_center_crop_resize_shape():
    img = jnp.zeros((300, 400, 3), jnp.uint8)
    out = center_crop_resize(img, 224)
    assert out.shape == (224, 224, 3)


def test_mixup_cutmix_targets_sum_to_one():
    key = jax.random.key(0)
    imgs = jnp.zeros((8, 32, 32, 3))
    labels = jnp.arange(8) % 4
    out, targets = mixup_cutmix(key, imgs, labels, num_classes=4)
    assert out.shape == imgs.shape and targets.shape == (8, 4)
    np.testing.assert_allclose(np.asarray(targets.sum(-1)), np.ones(8), rtol=1e-5)


def test_random_erasing_erases_some():
    key = jax.random.key(1)
    imgs = jnp.zeros((16, 32, 32, 3))
    out = random_erasing(key, imgs, prob=1.0)
    changed = np.asarray((jnp.abs(out) > 0).any(axis=(1, 2, 3)))
    assert changed.all()


def test_distributed_indices_partition():
    parts = [distributed_indices(103, r, 4, epoch=2) for r in range(4)]
    assert all(len(p) == 26 for p in parts)  # ceil(103/4)=26
    union = np.concatenate(parts)
    assert set(union.tolist()) == set(range(103))  # covers all (with pad dups)


def test_samplers_empty_dataset():
    """n == 0 returns an empty shard instead of ZeroDivisionError (ADVICE r2)."""
    assert len(distributed_indices(0, 0, 4, epoch=0)) == 0
    assert len(ra_sampler_indices(0, 1, 4, epoch=0)) == 0


def test_ra_sampler_semantics():
    n, world = 1024, 4
    parts = [ra_sampler_indices(n, r, world, epoch=0) for r in range(world)]
    # truncation: floor(1024/256)*256/4 = 256 per rank
    assert all(len(p) == 256 for p in parts)
    # repeated augmentation: some index appears more than once globally
    union = np.concatenate(parts)
    _, counts = np.unique(union, return_counts=True)
    assert counts.max() >= 2


def test_ra_sampler_truncation_non_multiple_of_256():
    """deit/samplers.py:35 truncates with len // 256 * 256 / replicas —
    integer-floor to a 256 multiple BEFORE the rank split (the round-1
    operator-precedence bug only showed when n % 256 != 0)."""
    parts = [ra_sampler_indices(1000, r, 4, epoch=0) for r in range(4)]
    assert all(len(p) == 768 // 4 for p in parts)  # 1000//256*256/4 = 192
    parts = [ra_sampler_indices(1000, r, 1, epoch=0) for r in range(1)]
    assert len(parts[0]) == 768


def _make_fake_imagefolder(tmp_path, classes=2, per_class=3, size=(40, 50)):
    from PIL import Image

    rng = np.random.default_rng(0)
    for c in range(classes):
        d = tmp_path / f"class_{c}"
        d.mkdir()
        for i in range(per_class):
            arr = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
            Image.fromarray(arr).save(d / f"img{i}.jpg")
    return str(tmp_path)


def test_imagefolder_loader(tmp_path):
    root = _make_fake_imagefolder(tmp_path)
    ds = ImageFolder(root)
    assert len(ds) == 6 and ds.class_to_idx == {"class_0": 0, "class_1": 1}

    batches = list(
        iterate_batches(ds, np.arange(6), batch_size=2, size=32, train=True,
                        num_threads=2)
    )
    assert len(batches) == 3
    for b in batches:
        assert b["image"].shape == (2, 32, 32, 3) and b["image"].dtype == np.uint8
        assert b["label"].shape == (2,)

    ev = list(
        iterate_batches(ds, np.arange(6), batch_size=4, size=32, train=False,
                        num_threads=2)
    )
    assert [len(b["label"]) for b in ev] == [4, 2]  # keep last at eval


def test_synthetic_batches():
    bs = list(synthetic_batches(4, 32, 10, steps=2))
    assert len(bs) == 2 and bs[0]["image"].shape == (4, 32, 32, 3)


def test_distributed_indices_dataset_smaller_than_world():
    """torch DistributedSampler repeats the index list to cover any padding
    — with n < world_size every rank must still get the same shard size."""
    from mrla_tpu.data.samplers import distributed_indices

    sizes = set()
    seen = []
    for rank in range(8):
        idx = distributed_indices(2, rank, 8, epoch=0, shuffle=True)
        sizes.add(len(idx))
        seen.extend(idx.tolist())
    assert sizes == {1}
    assert set(seen) == {0, 1}  # only real indices, repeated
