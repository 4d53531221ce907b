"""RetinaNet path: anchors, box coding, NMS, head, end-to-end detections.

Oracles: hand-computed values following mmdet's documented formulas
(AnchorGenerator / DeltaXYWHBBoxCoder) and a trivially-correct pure-python
greedy NMS.  mmdet itself is not importable in this environment; the
reference snapshot vendors only the backbone + configs (SURVEY.md §3.5),
so config hyperparameters come from
mmdetection/configs/_base_/models/retinanet_r50mrlal_fpn.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mrla_tpu.detect import (
    RetinaHead,
    RetinaNet,
    base_anchors,
    bbox2delta,
    bbox_overlaps,
    delta2bbox,
    get_bboxes,
    grid_anchors,
    multiclass_nms_fixed,
    nms_fixed,
    num_base_anchors,
)
from mrla_tpu.ckpt.detect_convert import _convert_retina_head


# ---------------------------------------------------------------- anchors


def test_base_anchors_golden():
    """Stride 8, preset config: A=9, ratio-major / scale-minor order."""
    a = base_anchors(8)
    assert a.shape == (9, 4)
    # index 0: ratio .5, scale 4 -> w = 32/sqrt(.5), h = 32*sqrt(.5)
    w0, h0 = 32 / np.sqrt(0.5), 32 * np.sqrt(0.5)
    np.testing.assert_allclose(
        a[0], [-w0 / 2, -h0 / 2, w0 / 2, h0 / 2], rtol=1e-6
    )
    # index 1: ratio .5, scale 4 * 2^(1/3)
    s1 = 4 * 2 ** (1 / 3)
    np.testing.assert_allclose(
        a[1][2], 8 * s1 / np.sqrt(0.5) / 2, rtol=1e-6
    )
    # index 3: ratio 1, scale 4 -> the square 32x32 anchor
    np.testing.assert_allclose(a[3], [-16, -16, 16, 16], rtol=1e-6)
    # index 6: ratio 2 -> tall (h > w)
    assert a[6][3] - a[6][1] > a[6][2] - a[6][0]


def test_grid_anchors_order():
    """Location-major (y outer, x inner), anchor-minor flattening."""
    base = np.array([[-1.0, -1, 1, 1], [-2, -2, 2, 2]], np.float32)
    g = grid_anchors((2, 3), 16, base)
    assert g.shape == (2 * 3 * 2, 4)
    np.testing.assert_allclose(g[0], [-1, -1, 1, 1])
    np.testing.assert_allclose(g[1], [-2, -2, 2, 2])
    # next cell along x: shift (16, 0)
    np.testing.assert_allclose(g[2], [15, -1, 17, 1])
    # first cell of the second row: shift (0, 16)
    np.testing.assert_allclose(g[6], [-1, 15, 1, 17])
    assert num_base_anchors() == 9


# ------------------------------------------------------------- box coding


def test_delta2bbox_golden():
    rois = jnp.array([[0.0, 0, 10, 10]])
    # identity deltas
    out = delta2bbox(rois, jnp.zeros((1, 4)))
    np.testing.assert_allclose(np.asarray(out), [[0, 0, 10, 10]], atol=1e-6)
    # dx=1 moves the center by one width; dw=log 2 doubles the width
    # (center 5,5 -> 15,5; w 10 -> 20; h unchanged)
    out = delta2bbox(rois, jnp.array([[1.0, 0, np.log(2.0), 0]]))
    np.testing.assert_allclose(np.asarray(out), [[5, 0, 25, 10]], atol=1e-5)
    # wh_ratio_clip caps dw at log(1000/16)
    out = delta2bbox(rois, jnp.array([[0.0, 0, 50.0, 0]]))
    w = float(out[0, 2] - out[0, 0])
    np.testing.assert_allclose(w, 10 * 1000 / 16, rtol=1e-5)
    # max_shape clips
    # center moves to (15, 15) -> box [10, 10, 20, 20], clipped at 12
    out = delta2bbox(
        rois, jnp.array([[1.0, 1, 0, 0]]), max_shape=(12, 12)
    )
    np.testing.assert_allclose(np.asarray(out), [[10, 10, 12, 12]], atol=1e-5)


def test_bbox2delta_roundtrip():
    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 50, (32, 2))
    wh = rng.uniform(2, 40, (32, 2))
    prop = np.concatenate([xy, xy + wh], -1).astype(np.float32)
    xy2 = rng.uniform(0, 50, (32, 2))
    wh2 = rng.uniform(2, 40, (32, 2))
    gt = np.concatenate([xy2, xy2 + wh2], -1).astype(np.float32)
    stds = (0.1, 0.1, 0.2, 0.2)  # rcnn-style stds exercise the denorm
    d = bbox2delta(jnp.asarray(prop), jnp.asarray(gt), stds=stds)
    back = delta2bbox(jnp.asarray(prop), d, stds=stds)
    np.testing.assert_allclose(np.asarray(back), gt, rtol=1e-4, atol=1e-3)


# -------------------------------------------------------------------- NMS


def _py_nms(boxes, scores, thr, max_out):
    """Trivially-correct greedy NMS (independent oracle)."""
    order = sorted(range(len(scores)), key=lambda i: -scores[i])
    keep = []
    for i in order:
        if scores[i] <= 0:
            continue
        ok = True
        for j in keep:
            xx1 = max(boxes[i][0], boxes[j][0])
            yy1 = max(boxes[i][1], boxes[j][1])
            xx2 = min(boxes[i][2], boxes[j][2])
            yy2 = min(boxes[i][3], boxes[j][3])
            inter = max(0, xx2 - xx1) * max(0, yy2 - yy1)
            ai = (boxes[i][2] - boxes[i][0]) * (boxes[i][3] - boxes[i][1])
            aj = (boxes[j][2] - boxes[j][0]) * (boxes[j][3] - boxes[j][1])
            if inter / max(ai + aj - inter, 1e-10) > thr:
                ok = False
                break
        if ok:
            keep.append(i)
            if len(keep) == max_out:
                break
    return keep


def test_nms_fixed_matches_python_oracle():
    rng = np.random.RandomState(1)
    for trial in range(5):
        xy = rng.uniform(0, 40, (64, 2))
        wh = rng.uniform(4, 30, (64, 2))
        boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
        scores = rng.uniform(0.01, 1, 64).astype(np.float32)
        idxs, valid = jax.jit(nms_fixed, static_argnums=(2, 3))(
            jnp.asarray(boxes), jnp.asarray(scores), 0.5, 16
        )
        got = [int(i) for i, v in zip(idxs, valid) if v]
        assert got == _py_nms(boxes, scores, 0.5, 16)


def test_bbox_overlaps_golden():
    a = jnp.array([[0.0, 0, 10, 10]])
    b = jnp.array([[0.0, 0, 10, 10], [5, 5, 15, 15], [20, 20, 30, 30]])
    iou = np.asarray(bbox_overlaps(a, b))[0]
    np.testing.assert_allclose(iou, [1.0, 25 / 175, 0.0], rtol=1e-6)


def test_multiclass_nms_class_isolation():
    # identical boxes, different classes: both survive (class-offset trick);
    # a same-class overlapping duplicate is suppressed.
    boxes = jnp.array(
        [[0.0, 0, 10, 10], [0.5, 0, 10, 10], [0, 0, 10, 10]]
    )
    scores = jnp.array(
        [
            [0.9, 0.0],  # box0 class0
            [0.8, 0.0],  # box1 class0 — overlaps box0, suppressed
            [0.0, 0.7],  # box2 class1 — identical to box0 but class1: kept
        ]
    )
    b, s, l, v = multiclass_nms_fixed(boxes, scores, 0.05, 0.5, 4)
    kept = [(float(si), int(li)) for si, li, vi in zip(s, l, v) if vi]
    assert kept == [(pytest.approx(0.9), 0), (pytest.approx(0.7), 1)]
    # score_thr filters
    _, s2, _, v2 = multiclass_nms_fixed(boxes, scores, 0.95, 0.5, 4)
    assert not bool(np.any(np.asarray(v2)))


# ------------------------------------------------------------------- head


def test_retina_head_init_and_sharing():
    head = RetinaHead(num_classes=7, feat_channels=32, stacked_convs=2,
                      num_anchors=9)
    x = jnp.zeros((2, 8, 8, 32))
    v = head.init(jax.random.key(0), x)
    p = v["params"]
    assert set(p) == {"cls_conv0", "cls_conv1", "reg_conv0", "reg_conv1",
                      "retina_cls", "retina_reg"}
    assert p["retina_cls"]["kernel"].shape == (3, 3, 32, 9 * 7)
    assert p["retina_reg"]["kernel"].shape == (3, 3, 32, 9 * 4)
    # focal prior bias: sigmoid(bias) == 0.01
    np.testing.assert_allclose(
        np.asarray(p["retina_cls"]["bias"]),
        -np.log((1 - 0.01) / 0.01),
        rtol=1e-6,
    )
    assert np.allclose(np.asarray(p["retina_reg"]["bias"]), 0.0)
    # level sharing: the SAME params apply to any spatial size
    cls_a, reg_a = head.apply(v, jnp.ones((1, 8, 8, 32)))
    cls_b, reg_b = head.apply(v, jnp.ones((1, 4, 4, 32)))
    assert cls_a.shape == (1, 8, 8, 63) and reg_a.shape == (1, 8, 8, 36)
    assert cls_b.shape == (1, 4, 4, 63) and reg_b.shape == (1, 4, 4, 36)


# ------------------------------------------------------------- end-to-end


def test_retinanet_end_to_end():
    model = RetinaNet(layers=(1, 1, 1, 1), num_classes=4)
    x = jnp.zeros((1, 128, 128, 3))
    v = model.init(jax.random.key(0), x, train=False)
    assert set(v["params"]) == {"backbone", "neck", "bbox_head"}
    outs = model.apply(v, jnp.ones((2, 128, 128, 3)), train=False)
    # P3..P7 at strides 8..128
    assert [c.shape for c, _ in outs] == [
        (2, 16, 16, 36), (2, 8, 8, 36), (2, 4, 4, 36),
        (2, 2, 2, 36), (2, 1, 1, 36),
    ]
    assert [r.shape for _, r in outs] == [
        (2, 16, 16, 36), (2, 8, 8, 36), (2, 4, 4, 36),
        (2, 2, 2, 36), (2, 1, 1, 36),
    ]

    boxes, scores, labels, valid = jax.jit(
        lambda o: get_bboxes(o, img_shape=(128, 128), nms_pre=100,
                             max_per_img=10)
    )(outs)
    assert boxes.shape == (2, 10, 4) and scores.shape == (2, 10)
    assert labels.shape == (2, 10) and valid.shape == (2, 10)
    assert np.all(np.isfinite(np.asarray(boxes)))
    b = np.asarray(boxes)
    assert b.min() >= 0 and b.max() <= 128
    lab = np.asarray(labels)
    assert np.all((lab >= -1) & (lab < 4))
    # at focal-prior init every sigmoid score is ~0.01 < score_thr=0.05
    assert not bool(np.any(np.asarray(valid)))
    # detections appear once scores clear the threshold
    _, s2, _, v2 = get_bboxes(outs, img_shape=(128, 128), nms_pre=100,
                              score_thr=0.005, max_per_img=10)
    assert bool(np.any(np.asarray(v2)))


# -------------------------------------------------------------- converter


def test_convert_retina_head_keys():
    rng = np.random.RandomState(0)
    sd = {}
    for branch in ("cls", "reg"):
        for i in range(4):
            sd[f"bbox_head.{branch}_convs.{i}.conv.weight"] = rng.randn(
                256, 256, 3, 3
            ).astype(np.float32)
            sd[f"bbox_head.{branch}_convs.{i}.conv.bias"] = rng.randn(
                256
            ).astype(np.float32)
    sd["bbox_head.retina_cls.weight"] = rng.randn(720, 256, 3, 3).astype(
        np.float32
    )
    sd["bbox_head.retina_cls.bias"] = rng.randn(720).astype(np.float32)
    sd["bbox_head.retina_reg.weight"] = rng.randn(36, 256, 3, 3).astype(
        np.float32
    )
    sd["bbox_head.retina_reg.bias"] = rng.randn(36).astype(np.float32)

    head = _convert_retina_head(sd)
    assert set(head) == {
        *(f"cls_conv{i}" for i in range(4)),
        *(f"reg_conv{i}" for i in range(4)),
        "retina_cls",
        "retina_reg",
    }
    assert head["retina_cls"]["kernel"].shape == (3, 3, 256, 720)
    assert head["cls_conv0"]["kernel"].shape == (3, 3, 256, 256)
    # OIHW -> HWIO value check
    np.testing.assert_allclose(
        head["retina_reg"]["kernel"][1, 2, 5, 7],
        sd["bbox_head.retina_reg.weight"][7, 5, 1, 2],
    )
    # these trees drop into RetinaHead.apply directly
    hd = RetinaHead(num_classes=80, feat_channels=256, stacked_convs=4,
                    num_anchors=9)
    jhead = jax.tree.map(jnp.asarray, head)
    cls, reg = hd.apply({"params": jhead}, jnp.ones((1, 4, 4, 256)))
    assert cls.shape == (1, 4, 4, 720) and reg.shape == (1, 4, 4, 36)


# --------------------------------------------------------------- soft-NMS


def _py_soft_nms(boxes, scores, thr, max_out, method, sigma, min_score):
    """Sequential soft-NMS oracle (Bodla et al. alg. 2, mmdet semantics)."""
    boxes = [list(map(float, b)) for b in boxes]
    live = [float(s) for s in scores]
    picks = []
    for _ in range(max_out):
        best = max(range(len(live)), key=lambda j: live[j])
        if live[best] <= min_score:
            break
        picks.append((best, live[best]))
        bbest = boxes[best]
        for j in range(len(live)):
            if j == best or live[j] == -1:
                continue
            xx1 = max(bbest[0], boxes[j][0]); yy1 = max(bbest[1], boxes[j][1])
            xx2 = min(bbest[2], boxes[j][2]); yy2 = min(bbest[3], boxes[j][3])
            inter = max(0.0, xx2 - xx1) * max(0.0, yy2 - yy1)
            ab = (bbest[2]-bbest[0])*(bbest[3]-bbest[1])
            aj = (boxes[j][2]-boxes[j][0])*(boxes[j][3]-boxes[j][1])
            iou = inter / max(ab + aj - inter, 1e-10)
            if method == "linear":
                if iou > thr:
                    live[j] *= 1.0 - iou
            else:
                import math
                live[j] *= math.exp(-(iou * iou) / sigma)
        live[best] = -1
    return picks


def test_soft_nms_matches_python_oracle():
    from mrla_tpu.detect import soft_nms_fixed

    rng = np.random.RandomState(3)
    for method in ("linear", "gaussian"):
        for trial in range(3):
            xy = rng.uniform(0, 30, (32, 2))
            wh = rng.uniform(6, 25, (32, 2))
            boxes = np.concatenate([xy, xy + wh], -1).astype(np.float32)
            scores = rng.uniform(0.01, 1, 32).astype(np.float32)
            idxs, out_s, valid = jax.jit(
                soft_nms_fixed, static_argnums=(2, 3, 4)
            )(jnp.asarray(boxes), jnp.asarray(scores), 0.3, 12, method)
            got = [(int(i), float(s))
                   for i, s, v in zip(idxs, out_s, valid) if v]
            want = _py_soft_nms(boxes, scores, 0.3, 12, method, 0.5, 1e-3)
            assert [g[0] for g in got] == [w[0] for w in want]
            np.testing.assert_allclose(
                [g[1] for g in got], [w[1] for w in want], rtol=1e-5
            )


def test_soft_nms_exact_duplicates_no_nan():
    from mrla_tpu.detect import soft_nms_fixed

    boxes = jnp.asarray([[0.0, 0, 10, 10]] * 3)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    idxs, out_s, valid = soft_nms_fixed(boxes, scores, 0.3, 3, "linear")
    # linear decay at iou=1 zeroes the duplicates -> only one pick
    assert int(valid.sum()) == 1 and int(idxs[0]) == 0
    assert np.all(np.isfinite(np.asarray(out_s)))
