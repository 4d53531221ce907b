"""Patch-DMA Pallas RoIAlign (kernels/roialign_patch.py) numerics.

Interpret-mode (CPU) parity against the XLA gather path
(`detect/roi_align.py:batched_roi_align`), which is itself torch-oracle
tested in test_two_stage.py — covering the static grids, the adaptive
``sampling_ratio=0`` grid (the reference presets' setting,
faster_rcnn_r50mrlal_fpn.py:40), realistic multilevel roi scale mixes,
out-of-canvas rois (border rules), degenerate/invalid rois, and the
unaligned-width top level (the 8-slack column alignment path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrla_tpu.detect.roi_align import batched_roi_align
from mrla_tpu.kernels.roialign_patch import roi_align_patch


def _feats(rng, b, sizes, c=256, dtype=jnp.float32):
    return [
        jnp.asarray(rng.standard_normal((b, h, w, c)), dtype)
        for h, w in sizes
    ]


def _realistic_rois(rng, b, p, canvas_hw, smin=8.0, smax=700.0, clamp=True):
    ch, cw = canvas_hw
    scale = np.exp(rng.uniform(np.log(smin), np.log(smax), (b, p)))
    ar = np.exp(rng.uniform(np.log(1 / 3), np.log(3.0), (b, p)))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(0, cw, (b, p))
    cy = rng.uniform(0, ch, (b, p))
    r = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    if clamp:
        r[..., 0::2] = np.clip(r[..., 0::2], 0, cw)
        r[..., 1::2] = np.clip(r[..., 1::2], 0, ch)
    return jnp.asarray(r.astype(np.float32))


@pytest.mark.parametrize("sr", [2, 1, 0])
def test_matches_xla_gather(sr):
    rng = np.random.default_rng(0)
    sizes = [(200, 336), (100, 168), (50, 84), (25, 42)]
    feats = _feats(rng, 2, sizes)
    rois = _realistic_rois(rng, 2, 48, (800, 1344))
    valid = jnp.asarray(rng.random((2, 48)) > 0.1)
    ref = batched_roi_align(feats, rois, valid, sampling_ratio=sr)
    got = roi_align_patch(feats, rois, valid, sampling_ratio=sr,
                          interpret=True)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    # fp32 reassociation only: the kernel folds the slot average into a
    # weight matrix and contracts on the (interpreted) MXU path
    assert rel < 2e-4, rel


def test_unclamped_and_degenerate_rois():
    """Out-of-canvas rois use the border rules; zero-extent padded rois
    are zeroed via roi_valid — identical to the XLA path."""
    rng = np.random.default_rng(1)
    sizes = [(100, 168), (50, 84), (25, 42), (13, 21)]
    feats = _feats(rng, 1, sizes)
    rois = np.array(
        _realistic_rois(rng, 1, 16, (400, 672), clamp=False))
    rois[0, :4] = 0.0  # degenerate padded rows
    valid = jnp.asarray(np.arange(16)[None, :] >= 4)
    rois = jnp.asarray(rois)
    ref = batched_roi_align(feats, rois, valid, strides=(4, 8, 16, 32),
                            sampling_ratio=0)
    got = roi_align_patch(feats, rois, valid, strides=(4, 8, 16, 32),
                          sampling_ratio=0, interpret=True)
    rel = float(jnp.max(jnp.abs(ref - got))) / (
        float(jnp.max(jnp.abs(ref))) + 1e-9)
    assert rel < 2e-4, rel
    assert float(jnp.max(jnp.abs(got[0, :4]))) == 0.0


def test_detector_roi_backend_pallas(monkeypatch):
    """FasterRCNN(roi_backend='pallas') routes through the patch kernel
    (interpret mode here) and matches the XLA backend's head outputs."""
    import functools

    import mrla_tpu.kernels.roialign_patch as rp
    from mrla_tpu.detect.two_stage import FasterRCNN, init_detector

    monkeypatch.setattr(
        rp, "roi_align_patch",
        functools.partial(roi_align_patch, interpret=True),
    )
    rng = np.random.default_rng(3)
    h, w = 64, 128
    x = jnp.asarray(rng.standard_normal((1, h, w, 3)), jnp.float32)
    kw = dict(layers=(1, 1, 1, 1), num_classes=4, rpn_nms_pre=32,
              num_proposals=8)
    m_ref = FasterRCNN(**kw)
    v = init_detector(m_ref, jax.random.key(0), x)
    ref = m_ref.apply(v, x, train=False)
    got = FasterRCNN(roi_backend="pallas", **kw).apply(v, x, train=False)
    np.testing.assert_array_equal(
        np.asarray(ref["proposals"]), np.asarray(got["proposals"]))
    d = float(jnp.max(jnp.abs(ref["cls"] - got["cls"])))
    s = float(jnp.max(jnp.abs(ref["cls"]))) + 1e-9
    assert d / s < 2e-4, d / s


def test_bf16_path():
    rng = np.random.default_rng(2)
    sizes = [(56, 56), (28, 28), (14, 14), (7, 7)]
    feats = _feats(rng, 1, sizes, dtype=jnp.bfloat16)
    rois = _realistic_rois(rng, 1, 24, (224, 224))
    ref = batched_roi_align(feats, rois, None, sampling_ratio=2)
    got = roi_align_patch(feats, rois, None, sampling_ratio=2,
                          interpret=True)
    rel = float(jnp.max(jnp.abs(
        ref.astype(jnp.float32) - got.astype(jnp.float32)
    ))) / float(jnp.max(jnp.abs(ref.astype(jnp.float32))))
    assert rel < 5e-2, rel
