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


@pytest.mark.parametrize("sr", [2, 0])
def test_grad_matches_xla_gather(sr):
    """Custom-VJP parity (round 5): the patch-DMA backward (per-roi
    Ayᵀ·G·Ax + RMW-DMA scatter) must match jax.grad through the XLA
    gather path at fp32 tolerance, across all FPN levels, overlapping
    rois, and invalid-roi masking."""
    rng = np.random.default_rng(7)
    sizes = [(64, 88), (32, 44), (16, 22), (8, 11)]
    feats = _feats(rng, 2, sizes, c=128)
    rois = _realistic_rois(rng, 2, 24, (256, 352))
    valid = jnp.asarray(rng.random((2, 24)) > 0.2)
    ct = jnp.asarray(
        rng.standard_normal((2, 24, 7, 7, 128)), jnp.float32)

    def loss_patch(fs):
        return jnp.sum(
            roi_align_patch(fs, rois, valid, sampling_ratio=sr,
                            interpret=True) * ct)

    def loss_xla(fs):
        return jnp.sum(
            batched_roi_align(fs, rois, valid, sampling_ratio=sr) * ct)

    gp = jax.grad(loss_patch)(feats)
    gx = jax.grad(loss_xla)(feats)
    lvls_hit = 0
    for level, (a, b) in enumerate(zip(gp, gx)):
        scale = float(jnp.max(jnp.abs(b)))
        if scale > 0:
            lvls_hit += 1
            rel = float(jnp.max(jnp.abs(a - b))) / scale
            assert rel < 2e-4, (level, rel)
        else:
            assert float(jnp.max(jnp.abs(a))) == 0.0, level
    assert lvls_hit >= 3, "roi mix failed to exercise multiple FPN levels"


def test_grad_no_flow_to_rois_and_valid():
    """Roi coordinates and the valid mask get zero cotangents (the
    torchvision/mmcv RoIAlign contract — boxes are not differentiated)."""
    rng = np.random.default_rng(8)
    sizes = [(32, 44), (16, 22), (8, 11), (4, 8)]
    feats = _feats(rng, 1, sizes, c=128)
    rois = _realistic_rois(rng, 1, 8, (128, 176))
    valid = jnp.ones((1, 8), jnp.float32)

    def loss(r, v):
        return jnp.sum(
            roi_align_patch(feats, r, v, sampling_ratio=0,
                            interpret=True))

    gr, gv = jax.grad(loss, argnums=(0, 1))(rois, valid)
    assert float(jnp.max(jnp.abs(gr))) == 0.0
    assert float(jnp.max(jnp.abs(gv))) == 0.0


def test_grad_invalid_rois_contribute_nothing():
    """An invalid roi's cotangent must not leak into the feature grads
    (the forward masks its output via meta valid; the backward masks the
    incoming cotangent the same way)."""
    rng = np.random.default_rng(9)
    sizes = [(32, 44), (16, 22), (8, 11), (4, 8)]
    feats = _feats(rng, 1, sizes, c=128)
    rois = _realistic_rois(rng, 1, 8, (128, 176))
    ct = jnp.asarray(rng.standard_normal((1, 8, 7, 7, 128)), jnp.float32)

    def loss(fs, v):
        return jnp.sum(
            roi_align_patch(fs, rois, v, sampling_ratio=2,
                            interpret=True) * ct)

    all_v = jnp.ones((1, 8), jnp.float32)
    half_v = all_v.at[0, :4].set(0.0)
    g_half = jax.grad(loss)(feats, half_v)
    # reference: gradient with only the valid half's cotangent live
    ct_masked = ct * half_v[..., None, None, None]

    def loss_masked(fs):
        return jnp.sum(
            roi_align_patch(fs, rois, all_v, sampling_ratio=2,
                            interpret=True) * ct_masked)

    g_ref = jax.grad(loss_masked)(feats)
    for a, b in zip(g_half, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


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
