"""Two-stage training path: samplers, RPN loss, R-CNN targets/losses.

Config semantics under test come from the reference's train_cfg
(mmdetection/configs/_base_/models/faster_rcnn_r50mrlal_fpn.py:58-96).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from mrla_tpu.detect import (
    FasterRCNN,
    MaskRCNN,
    faster_rcnn_train_loss,
    init_detector,
    mask_loss,
    random_sample,
    rcnn_loss,
    rcnn_targets,
    rpn_loss,
)


# ----------------------------------------------------------------- sampler


def test_random_sample_budgets():
    rng = np.random.RandomState(0)
    pos = jnp.asarray(rng.rand(400) < 0.5)  # ~200 positives
    neg = ~pos
    pos_s, neg_s = random_sample(jax.random.key(0), pos, neg, 256, 0.5)
    assert int(pos_s.sum()) == 128  # capped at num*pos_fraction
    assert int(neg_s.sum()) == 128  # fills the remainder
    assert not bool(jnp.any(pos_s & ~pos))
    assert not bool(jnp.any(neg_s & ~neg))
    # scarce positives: negatives fill up
    pos2 = jnp.zeros(400, bool).at[:10].set(True)
    pos_s2, neg_s2 = random_sample(
        jax.random.key(1), pos2, ~pos2, 256, 0.5
    )
    assert int(pos_s2.sum()) == 10
    assert int(neg_s2.sum()) == 246
    # different keys give different draws
    pos_s3, _ = random_sample(jax.random.key(2), pos, neg, 256, 0.5)
    assert bool(jnp.any(pos_s3 != pos_s))


# ---------------------------------------------------------------- rpn loss


def _tiny_rpn_outs(rng, b=2, sizes=((16, 16), (8, 8), (4, 4))):
    return tuple(
        (
            jnp.asarray(rng.randn(b, h, w, 3).astype(np.float32)),
            jnp.asarray(0.1 * rng.randn(b, h, w, 12).astype(np.float32)),
        )
        for h, w in sizes
    )


def test_rpn_loss_finite_and_positive_anchors():
    rng = np.random.RandomState(0)
    outs = _tiny_rpn_outs(rng)
    gt_boxes = jnp.asarray([[[8.0, 8, 40, 40]], [[20.0, 20, 60, 60]]])
    gt_valid = jnp.ones((2, 1), bool)
    l = jax.jit(
        lambda o: rpn_loss(o, gt_boxes, gt_valid, jax.random.key(0),
                           strides=(4, 8, 16), num_samples=64)
    )(outs)
    assert int(l["num_pos"]) > 0
    assert np.isfinite(float(l["loss_rpn_cls"]))
    assert np.isfinite(float(l["loss_rpn_bbox"]))
    # no gt: classification loss only, no positives
    l0 = rpn_loss(outs, gt_boxes, jnp.zeros((2, 1), bool),
                  jax.random.key(0), strides=(4, 8, 16), num_samples=64)
    assert int(l0["num_pos"]) == 0
    assert float(l0["loss_rpn_bbox"]) == 0.0
    assert float(l0["loss_rpn_cls"]) > 0
    # regression: ZERO-AREA padded gt at row 0 (an empty image as padded
    # by the COCO loader) — bbox2delta on it emits log(0) = -inf, which
    # must never reach the loss (inf * 0 = NaN)
    zero_boxes = jnp.zeros((2, 1, 4))
    lz = rpn_loss(outs, zero_boxes, jnp.zeros((2, 1), bool),
                  jax.random.key(0), strides=(4, 8, 16), num_samples=64)
    assert np.isfinite(float(lz["loss_rpn_bbox"]))
    assert np.isfinite(float(lz["loss_rpn_cls"]))


# ------------------------------------------------------------ rcnn targets


def test_rcnn_targets_gt_as_proposals_and_prefix_order():
    rng = np.random.RandomState(0)
    xy = rng.uniform(0, 80, (40, 2)).astype(np.float32)
    wh = rng.uniform(8, 40, (40, 2)).astype(np.float32)
    proposals = jnp.asarray(
        np.concatenate([xy, xy + wh], -1)
    )[None]
    prop_valid = jnp.ones((1, 40), bool)
    gt_boxes = jnp.asarray([[[10.0, 10, 50, 50], [60.0, 60, 100, 100]]])
    gt_labels = jnp.asarray([[2, 5]])
    gt_valid = jnp.ones((1, 2), bool)
    t = rcnn_targets(
        jax.random.key(0), proposals, prop_valid, gt_boxes, gt_labels,
        gt_valid, num_classes=7, num=32, pos_fraction=0.25,
    )
    assert t["rois"].shape == (1, 32, 4)
    # gt were added as proposals: IoU-1 candidates exist, so positives > 0
    npos = int(t["bbox_weights"].sum())
    assert npos > 0
    # positives occupy the static prefix
    w = np.asarray(t["bbox_weights"][0])
    assert np.all(w[:npos] == 1) and np.all(w[npos:] == 0)
    # positive labels are gt classes; negatives are background (=7)
    lab = np.asarray(t["labels"][0])
    assert set(lab[:npos]) <= {2, 5}
    assert np.all(lab[npos:][np.asarray(t["label_weights"][0])[npos:] > 0]
                  == 7)
    # a roi that IS a gt box has zero-delta targets
    rois = np.asarray(t["rois"][0])
    for g, glab in [(0, 2), (1, 5)]:
        hit = np.where(
            (np.abs(rois - np.asarray(gt_boxes[0, g])).max(1) < 1e-5)
            & (w > 0)
        )[0]
        if hit.size:
            np.testing.assert_allclose(
                np.asarray(t["bbox_targets"][0, hit[0]]), 0.0, atol=1e-5
            )
            assert lab[hit[0]] == glab


def test_rcnn_loss_golden():
    # 2 rois, 3 classes: roi0 pos class 1 with exact deltas; roi1 bg
    targets = {
        "labels": jnp.asarray([[1, 3]]),
        "label_weights": jnp.asarray([[1.0, 1.0]]),
        "bbox_targets": jnp.asarray([[[0.5, 0, 0, 0], [0.0] * 4]]),
        "bbox_weights": jnp.asarray([[1.0, 0.0]]),
    }
    cls = jnp.asarray([[[0.0, 10.0, 0, 0], [0, 0, 0, 10.0]]])
    reg = jnp.zeros((1, 2, 12)).at[0, 0, 4:8].set(
        jnp.asarray([0.5, 0, 0, 0])
    )
    l = rcnn_loss(cls, reg, targets)
    assert float(l["loss_cls"]) < 1e-3  # both confident-correct
    assert float(l["loss_bbox"]) < 1e-6  # exact regression on own class
    # wrong-class regression does not count
    reg_wrong = jnp.zeros((1, 2, 12)).at[0, 0, 0:4].set(
        jnp.asarray([0.5, 0, 0, 0])
    )
    l2 = rcnn_loss(cls, reg_wrong, targets)
    np.testing.assert_allclose(float(l2["loss_bbox"]), 0.5 / 2, rtol=1e-5)


# --------------------------------------------------------------- mask loss


def test_mask_loss_crop_and_weighting():
    # one positive roi exactly on a solid gt mask: strong positive logits
    # -> near-zero loss; strong negative logits -> large loss
    gt_masks = jnp.zeros((1, 1, 64, 64)).at[:, :, 16:48, 16:48].set(1.0)
    targets = {
        "rois": jnp.asarray([[[16.0, 16, 48, 48], [0.0, 0, 8, 8]]]),
        "labels": jnp.asarray([[0, 2]]),
        "bbox_weights": jnp.asarray([[1.0, 0.0]]),
        "gt_index": jnp.asarray([[0, 0]]),
    }
    good = jnp.full((1, 2, 28, 28, 2), 12.0)
    assert float(mask_loss(good, targets, gt_masks)) < 1e-4
    bad = jnp.full((1, 2, 28, 28, 2), -12.0)
    assert float(mask_loss(bad, targets, gt_masks)) > 5.0
    # the negative roi's logits don't matter (weight 0)
    mixed = good.at[:, 1].set(-50.0)
    assert float(mask_loss(mixed, targets, gt_masks)) < 1e-4


# ------------------------------------------------------------- end-to-end


def test_faster_rcnn_train_loss_and_grads():
    model = FasterRCNN(
        layers=(1, 1, 1, 1), num_classes=3, rpn_nms_pre=100,
        num_proposals=30,
    )
    x = jnp.ones((1, 128, 128, 3))
    v = init_detector(model, jax.random.key(0), x)
    gt_boxes = jnp.asarray([[[16.0, 16, 80, 80], [0.0] * 4]])
    gt_labels = jnp.asarray([[1, 0]])
    gt_valid = jnp.asarray([[True, False]])

    def loss_fn(params):
        total, losses, _ = faster_rcnn_train_loss(
            model,
            {"params": params, "batch_stats": v["batch_stats"]},
            x, gt_boxes, gt_labels, gt_valid, jax.random.key(1),
            rcnn_num=16, rpn_num=32,
        )
        return total, losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(v["params"])
    for k in ("loss_rpn_cls", "loss_rpn_bbox", "loss_cls", "loss_bbox"):
        assert np.isfinite(float(losses[k])), k
    # gradients reach every branch (rpn head, bbox head, backbone)
    gnorms = {
        k: float(
            optax.global_norm(jax.tree.map(jnp.asarray, grads[k]))
        )
        for k in grads
    }
    assert gnorms["rpn_head"] > 0
    assert gnorms["bbox_head"] > 0
    assert gnorms["backbone"] > 0


def test_mask_rcnn_train_loss():
    model = MaskRCNN(
        layers=(1, 1, 1, 1), num_classes=3, rpn_nms_pre=50,
        num_proposals=20,
    )
    x = jnp.ones((1, 128, 128, 3))
    v = init_detector(model, jax.random.key(0), x)
    gt_boxes = jnp.asarray([[[16.0, 16, 80, 80]]])
    gt_labels = jnp.asarray([[1]])
    gt_valid = jnp.asarray([[True]])
    gt_masks = jnp.zeros((1, 1, 128, 128)).at[:, :, 20:76, 20:76].set(1.0)
    total, losses, _ = jax.jit(
        lambda p: faster_rcnn_train_loss(
            model, {"params": p, "batch_stats": v["batch_stats"]},
            x, gt_boxes, gt_labels, gt_valid, jax.random.key(1),
            gt_masks=gt_masks, rcnn_num=8, rpn_num=32,
        )
    )(v["params"])
    assert "loss_mask" in losses
    assert np.isfinite(float(losses["loss_mask"]))
    assert np.isfinite(float(total))
