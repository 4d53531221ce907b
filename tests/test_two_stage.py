"""Two-stage path: RoIAlign, RPN proposals, R-CNN heads, Faster/Mask R-CNN.

Oracles: a straight sequential-python transcription of torchvision's
documented aligned RoIAlign algorithm (structurally unlike the vectorized
flat-gather implementation) and hand-computed goldens.  Config
hyperparameters from
mmdetection/configs/_base_/models/faster_rcnn_r50mrlal_fpn.py and
mask_rcnn_r50mrlal_fpn.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrla_tpu.detect import (
    FasterRCNN,
    MaskRCNN,
    RPNHead,
    Shared2FCBBoxHead,
    init_detector,
    map_roi_levels,
    rcnn_detections,
    roi_align_multilevel,
    rpn_proposals,
    two_stage_predict,
)


# --------------------------------------------------------------- roi align


def _np_roi_align(feat, roi, stride, out_size, sr):
    """Sequential aligned RoIAlign (torchvision algorithm, one roi)."""
    h, w, c = feat.shape
    x1 = roi[0] / stride - 0.5
    y1 = roi[1] / stride - 0.5
    x2 = roi[2] / stride - 0.5
    y2 = roi[3] / stride - 0.5
    bin_h = (y2 - y1) / out_size
    bin_w = (x2 - x1) / out_size
    res = np.zeros((out_size, out_size, c), np.float64)

    def sample(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return 0.0
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1i] * (1 - ly) * lx
            + feat[y1i, x0] * ly * (1 - lx)
            + feat[y1i, x1i] * ly * lx
        )

    for ph in range(out_size):
        for pw in range(out_size):
            acc = 0.0
            for iy in range(sr):
                for ix in range(sr):
                    y = y1 + (ph + (iy + 0.5) / sr) * bin_h
                    x = x1 + (pw + (ix + 0.5) / sr) * bin_w
                    acc = acc + sample(y, x)
            res[ph, pw] = acc / (sr * sr)
    return res


def test_roi_align_vs_sequential_oracle():
    rng = np.random.RandomState(0)
    feat = rng.randn(16, 20, 3).astype(np.float32)
    rois = np.array(
        [
            [8.0, 4, 72, 60],  # generic
            [0.0, 0, 80, 64],  # whole map
            [3.3, 7.7, 21.2, 39.9],  # fractional
            [60.0, 40, 79, 63],  # near border
        ],
        np.float32,
    )
    # single level at stride 4: force level 0 via finest_scale huge
    got = np.asarray(
        roi_align_multilevel(
            [jnp.asarray(feat)], jnp.asarray(rois),
            strides=(4,), out_size=7, sampling_ratio=2,
            finest_scale=1e9,
        )
    )
    for i, roi in enumerate(rois):
        want = _np_roi_align(feat, roi, 4, 7, 2)
        np.testing.assert_allclose(got[i], want, rtol=1e-4, atol=1e-5)


def _np_roi_align_adaptive(feat, roi, stride, out_size):
    """Sequential ADAPTIVE RoIAlign (mmcv sampling_ratio=0: the grid is
    ceil(bin_size) samples per axis, per roi) — one roi, one level."""
    h, w, c = feat.shape
    x1 = roi[0] / stride - 0.5
    y1 = roi[1] / stride - 0.5
    x2 = roi[2] / stride - 0.5
    y2 = roi[3] / stride - 0.5
    bin_h = (y2 - y1) / out_size
    bin_w = (x2 - x1) / out_size
    gh = max(int(np.ceil(bin_h)), 1)
    gw = max(int(np.ceil(bin_w)), 1)
    res = np.zeros((out_size, out_size, c), np.float64)

    def sample(y, x):
        if y < -1.0 or y > h or x < -1.0 or x > w:
            return 0.0
        y = min(max(y, 0.0), h - 1)
        x = min(max(x, 0.0), w - 1)
        y0, x0 = int(np.floor(y)), int(np.floor(x))
        y1i, x1i = min(y0 + 1, h - 1), min(x0 + 1, w - 1)
        ly, lx = y - y0, x - x0
        return (
            feat[y0, x0] * (1 - ly) * (1 - lx)
            + feat[y0, x1i] * (1 - ly) * lx
            + feat[y1i, x0] * ly * (1 - lx)
            + feat[y1i, x1i] * ly * lx
        )

    for ph in range(out_size):
        for pw in range(out_size):
            acc = 0.0
            for iy in range(gh):
                for ix in range(gw):
                    y = y1 + (ph + (iy + 0.5) / gh) * bin_h
                    x = x1 + (pw + (ix + 0.5) / gw) * bin_w
                    acc = acc + sample(y, x)
            res[ph, pw] = acc / (gh * gw)
    return res


def test_roi_align_adaptive_vs_sequential_oracle():
    """sampling_ratio=0 (the reference presets' setting,
    faster_rcnn_r50mrlal_fpn.py:40): per-roi ceil-grid matches the mmcv
    algorithm exactly across bins <1 (1-sample), 2-4 (in-range), and >4
    cells (the wide-roi regime the old static grid could not express)."""
    rng = np.random.RandomState(1)
    feat = rng.randn(24, 48, 3).astype(np.float32)
    rois = np.array(
        [
            [10.0, 10, 22, 22],      # bins < 1 cell  -> grid 1x1
            [8.0, 4, 100, 80],       # bins ~2.7x3.3  -> grid 3x4
            [0.0, 0, 190, 94],       # bins ~3.4x6.8  -> grid 4x7
            [3.3, 7.7, 21.2, 39.9],  # fractional, mixed tiny grid
            [1.0, 2, 185.5, 30.5],   # extreme aspect: grid 2x7
        ],
        np.float32,
    )
    got = np.asarray(
        roi_align_multilevel(
            [jnp.asarray(feat)], jnp.asarray(rois),
            strides=(4,), out_size=7, sampling_ratio=0,
            finest_scale=1e9,
        )
    )
    for i, roi in enumerate(rois):
        want = _np_roi_align_adaptive(feat, roi, 4, 7)
        np.testing.assert_allclose(
            got[i], want, rtol=1e-4, atol=1e-5, err_msg=f"roi {i}"
        )


def test_roi_align_adaptive_multilevel_realistic_scales():
    """Adaptive grid through the REAL 4-level mapping with rois drawn
    from the scale regimes COCO produces (small/medium/large, aspect
    1:3..3:1, plus canvas-size boxes that clamp to the top level)."""
    rng = np.random.RandomState(7)
    canvas_h, canvas_w = 256, 320
    feats = [
        rng.randn(canvas_h // s, canvas_w // s, 4).astype(np.float32)
        for s in (4, 8, 16, 32)
    ]
    rois = []
    for scale in (12.0, 40.0, 90.0, 150.0, 260.0):
        for ar in (1 / 3, 1.0, 3.0):
            w = scale * np.sqrt(ar)
            h = scale / np.sqrt(ar)
            cx = rng.uniform(0, canvas_w)
            cy = rng.uniform(0, canvas_h)
            rois.append([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
    rois.append([0.0, 0.0, canvas_w, canvas_h])  # whole canvas
    rois = np.asarray(rois, np.float32)
    got = np.asarray(
        roi_align_multilevel(
            feats, jnp.asarray(rois), strides=(4, 8, 16, 32),
            out_size=7, sampling_ratio=0,
        )
    )
    strides = (4, 8, 16, 32)
    for i, roi in enumerate(rois):
        scale = np.sqrt((roi[2] - roi[0]) * (roi[3] - roi[1]))
        lvl = int(np.clip(np.floor(np.log2(scale / 56.0 + 1e-6)), 0, 3))
        want = _np_roi_align_adaptive(feats[lvl], roi, strides[lvl], 7)
        np.testing.assert_allclose(
            got[i], want, rtol=1e-4, atol=1e-5, err_msg=f"roi {i}"
        )


def test_roi_align_static_grid_unchanged_by_weight_fold():
    """The sr>0 path now folds 1/sr into the bilinear weights; its values
    must still match the sequential static-grid oracle."""
    rng = np.random.RandomState(3)
    feat = rng.randn(16, 20, 3).astype(np.float32)
    roi = np.array([5.0, 6, 70, 58], np.float32)
    got = np.asarray(
        roi_align_multilevel(
            [jnp.asarray(feat)], jnp.asarray(roi[None]),
            strides=(4,), out_size=7, sampling_ratio=3,
            finest_scale=1e9,
        )
    )[0]
    np.testing.assert_allclose(
        got, _np_roi_align(feat, roi, 4, 7, 3), rtol=1e-4, atol=1e-5
    )


def test_roi_align_constant_map_is_constant():
    feat = jnp.full((8, 8, 2), 3.5)
    out = roi_align_multilevel(
        [feat], jnp.asarray([[1.0, 1, 25, 25]]), strides=(4,),
        out_size=7, finest_scale=1e9,
    )
    np.testing.assert_allclose(np.asarray(out), 3.5, rtol=1e-6)


def test_map_roi_levels_golden():
    """finest_scale=56: lvl = clamp(floor(log2(sqrt(area)/56)), 0, 3)."""
    rois = jnp.asarray(
        [
            [0.0, 0, 30, 30],   # scale 30  -> lvl 0
            [0.0, 0, 56, 56],   # scale 56  -> lvl 0
            [0.0, 0, 112, 112],  # scale 112 -> lvl 1
            [0.0, 0, 230, 230],  # scale 230 -> lvl 2
            [0.0, 0, 460, 460],  # scale 460 -> lvl 3
            [0.0, 0, 1200, 1200],  # clamped -> lvl 3
        ]
    )
    np.testing.assert_array_equal(
        np.asarray(map_roi_levels(rois, 4)), [0, 0, 1, 2, 3, 3]
    )


def test_roi_align_multilevel_routes_by_size():
    """A roi reads the level its size maps to: give each level a distinct
    constant and check the pooled value."""
    feats = [
        jnp.full((64, 64, 1), 1.0),  # stride 4
        jnp.full((32, 32, 1), 2.0),  # stride 8
        jnp.full((16, 16, 1), 3.0),  # stride 16
        jnp.full((8, 8, 1), 4.0),    # stride 32
    ]
    rois = jnp.asarray(
        [[0.0, 0, 40, 40], [0.0, 0, 120, 120], [0.0, 0, 240, 240]]
    )
    out = np.asarray(
        roi_align_multilevel(feats, rois, strides=(4, 8, 16, 32),
                             out_size=7)
    )
    np.testing.assert_allclose(out[0], 1.0, rtol=1e-6)
    np.testing.assert_allclose(out[1], 2.0, rtol=1e-6)
    np.testing.assert_allclose(out[2], 3.0, rtol=1e-6)


# --------------------------------------------------------------------- rpn


def test_rpn_head_shapes():
    head = RPNHead(feat_channels=32, num_anchors=3)
    v = head.init(jax.random.key(0), jnp.zeros((1, 8, 8, 32)))
    assert set(v["params"]) == {"rpn_conv", "rpn_cls", "rpn_reg"}
    cls, reg = head.apply(v, jnp.ones((2, 8, 8, 32)))
    assert cls.shape == (2, 8, 8, 3) and reg.shape == (2, 8, 8, 12)


def test_rpn_proposals_shapes_and_validity():
    rng = np.random.RandomState(0)
    sizes = [(16, 16), (8, 8), (4, 4), (2, 2), (1, 1)]
    outs = tuple(
        (
            jnp.asarray(rng.randn(2, h, w, 3).astype(np.float32)),
            jnp.asarray(
                0.1 * rng.randn(2, h, w, 12).astype(np.float32)
            ),
        )
        for h, w in sizes
    )
    props, scores, valid = jax.jit(
        lambda o: rpn_proposals(o, (64, 64), nms_pre=100, max_per_img=50)
    )(outs)
    assert props.shape == (2, 50, 4) and valid.shape == (2, 50)
    assert bool(np.any(np.asarray(valid)))
    p = np.asarray(props)
    assert p.min() >= 0 and p.max() <= 64
    s = np.asarray(scores)
    # scores come out in descending order per image
    for b in range(2):
        sv = s[b][np.asarray(valid[b])]
        assert np.all(np.diff(sv) <= 1e-6)


# -------------------------------------------------------------- bbox head


def test_shared2fc_bbox_head_shapes():
    head = Shared2FCBBoxHead(num_classes=6, fc_out_channels=64)
    v = head.init(jax.random.key(0), jnp.zeros((1, 5, 7, 7, 16)))
    assert set(v["params"]) == {
        "shared_fc0", "shared_fc1", "fc_cls", "fc_reg",
    }
    assert v["params"]["shared_fc0"]["kernel"].shape == (7 * 7 * 16, 64)
    cls, reg = head.apply(v, jnp.ones((2, 5, 7, 7, 16)))
    assert cls.shape == (2, 5, 7) and reg.shape == (2, 5, 24)


def test_rcnn_detections_golden():
    """One confident proposal decodes to its class-specific box; the
    background-dominant proposal yields nothing."""
    proposals = jnp.asarray([[[10.0, 10, 50, 50], [0.0, 0, 20, 20]]])
    valid = jnp.asarray([[True, True]])
    # classes: 2 + bg; proposal0 -> class 1 confident
    cls = jnp.asarray([[[-5.0, 5.0, -5.0], [-5.0, -5.0, 5.0]]])
    # class-1 deltas: dx=0.1 std .1 -> shift by 1 width unit? (0.1*0.1=0.01
    # of width 40 = 0.4px); keep zero for an exact-box check
    reg = jnp.zeros((1, 2, 8))
    boxes, scores, labels, v = rcnn_detections(
        proposals, valid, cls, reg, img_shape=(64, 64)
    )
    assert bool(v[0, 0]) and not bool(v[0, 1])
    assert int(labels[0, 0]) == 1
    np.testing.assert_allclose(
        np.asarray(boxes[0, 0]), [10, 10, 50, 50], atol=1e-4
    )
    assert float(scores[0, 0]) > 0.99


# ------------------------------------------------------------- end-to-end


def test_faster_rcnn_end_to_end():
    model = FasterRCNN(
        layers=(1, 1, 1, 1), num_classes=4, rpn_nms_pre=100,
        num_proposals=20,
    )
    x = jnp.ones((1, 128, 128, 3))
    v = init_detector(model, jax.random.key(0), x)
    assert set(v["params"]) == {
        "backbone", "neck", "rpn_head", "bbox_head",
    }
    out = model.apply(v, x, train=False)
    assert out["proposals"].shape == (1, 20, 4)
    assert out["cls"].shape == (1, 20, 5)
    assert out["reg"].shape == (1, 20, 16)
    res = two_stage_predict(model, v, x, max_per_img=10)
    assert res["det_boxes"].shape == (1, 10, 4)
    assert np.all(np.isfinite(np.asarray(res["det_boxes"])))
    assert "masks" not in res


def test_mask_rcnn_end_to_end():
    model = MaskRCNN(
        layers=(1, 1, 1, 1), num_classes=3, rpn_nms_pre=50,
        num_proposals=10,
    )
    x = jnp.ones((1, 128, 128, 3))
    v = init_detector(model, jax.random.key(0), x)
    assert "mask_head" in v["params"]
    res = two_stage_predict(model, v, x, max_per_img=5, score_thr=0.0)
    assert res["masks"].shape == (1, 5, 28, 28)
    m = np.asarray(res["masks"])
    assert np.all((m >= 0) & (m <= 1))


def test_remat_forward_identical():
    """remat=True must not change numerics (it only recomputes in the
    backward); checked for both detector families at tiny shapes."""
    from mrla_tpu.detect.retinanet import RetinaNet
    from mrla_tpu.detect.two_stage import FasterRCNN, init_detector

    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, 64, 64, 3)),
        jnp.float32,
    )
    for cls, kwargs in (
        (RetinaNet, {}),
        (FasterRCNN, dict(rpn_nms_pre=50, num_proposals=20)),
    ):
        m0 = cls(layers=(1, 1, 1, 1), num_classes=3, **kwargs)
        m1 = cls(layers=(1, 1, 1, 1), num_classes=3, remat=True, **kwargs)
        if cls is FasterRCNN:
            v = init_detector(m0, jax.random.key(0), x)
            o0 = m0.apply(v, x, method=FasterRCNN.extract_feats)
            o1 = m1.apply(v, x, method=FasterRCNN.extract_feats)
        else:
            v = m0.init(jax.random.key(0), x, train=False)
            o0 = m0.apply(v, x, train=False)
            o1 = m1.apply(v, x, train=False)
        for a, b in zip(jax.tree.leaves(o0), jax.tree.leaves(o1)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
