"""COCO segmentation decoding: polygon scanline fill + RLE (compressed
and uncompressed), and the masked batch pipeline.

Oracles: hand-computable shapes (axis-aligned rectangles, a right
triangle) and an independent RLE string ENCODER in the test (inverse of
pycocotools rleToString) so the decoder round-trips arbitrary masks.
"""

import json

import numpy as np
import pytest

from mrla_tpu.data.coco import (
    polygons_to_mask,
    rle_to_mask,
    segmentation_to_mask,
)


def test_polygon_rectangle():
    # rectangle [2, 3] -> [8, 7]: pixel centers strictly inside
    poly = [2.0, 3.0, 8.0, 3.0, 8.0, 7.0, 2.0, 7.0]
    m = polygons_to_mask([poly], 10, 12)
    ys, xs = np.where(m)
    assert xs.min() == 2 and xs.max() == 7  # centers 2.5..7.5 < 8
    assert ys.min() == 3 and ys.max() == 6
    assert m.sum() == 6 * 4


def test_polygon_triangle_half_area():
    # right triangle covering the lower-left half of a 20x20 square
    poly = [0.0, 0.0, 0.0, 20.0, 20.0, 20.0]
    m = polygons_to_mask([poly], 20, 20)
    # area within a pixel band of 200
    assert abs(int(m.sum()) - 200) <= 20
    assert m[19, 0] and not m[0, 19]
    # union of two polygons
    m2 = polygons_to_mask(
        [poly, [0.0, 0, 20, 0, 20, 20]], 20, 20
    )
    assert m2.sum() == 400  # both halves -> full square


def _rle_string_from_counts(counts):
    """Inverse of maskApi.c rleFrString (independent test encoder)."""
    s = []
    for i, x in enumerate(counts):
        if i > 2:
            x = x - counts[i - 2]
        more = True
        while more:
            c = x & 0x1F
            x >>= 5
            more = not (x == 0 and not (c & 0x10)) and not (
                x == -1 and (c & 0x10)
            )
            if more:
                c |= 0x20
            s.append(chr(c + 48))
    return "".join(s)


def test_rle_uncompressed_and_compressed():
    # column-major runs over a 4x6 canvas: 5 zeros, 3 ones, rest zeros
    h, w = 4, 6
    counts = [5, 3, h * w - 8]
    want = np.zeros(h * w, bool)
    want[5:8] = True
    want = want.reshape(w, h).T
    m1 = rle_to_mask({"size": [h, w], "counts": counts})
    np.testing.assert_array_equal(m1, want)
    # compressed round-trip through the independent encoder
    s = _rle_string_from_counts(counts)
    m2 = rle_to_mask({"size": [h, w], "counts": s})
    np.testing.assert_array_equal(m2, want)


def test_rle_compressed_random_roundtrip():
    rng = np.random.RandomState(0)
    for _ in range(5):
        h, w = rng.randint(3, 12, 2)
        mask = rng.rand(h, w) < 0.4
        # derive column-major run counts (starting with a zero-run)
        flat = mask.T.reshape(-1)
        counts, run, val = [], 0, False
        for v in flat:
            if bool(v) == val:
                run += 1
            else:
                counts.append(run)
                run, val = 1, bool(v)
        counts.append(run)
        s = _rle_string_from_counts(counts)
        got = rle_to_mask({"size": [int(h), int(w)], "counts": s})
        np.testing.assert_array_equal(got, mask)


def test_segmentation_dispatch():
    sq = segmentation_to_mask([[0.0, 0, 4, 0, 4, 4, 0, 4]], 6, 6)
    assert sq.sum() == 16
    r = segmentation_to_mask({"size": [6, 6], "counts": [6, 6, 24]}, 6, 6)
    assert r.sum() == 6  # one full column of ones (column-major)


def test_coco_batches_with_masks(tmp_path):
    from PIL import Image

    from mrla_tpu.data.coco import CocoDetection, coco_batches

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    size = 64
    arr = np.zeros((size, size, 3), np.uint8)
    Image.fromarray(arr).save(img_dir / "a.png")
    ann = {
        "images": [{"id": 0, "file_name": "a.png",
                    "width": size, "height": size}],
        "annotations": [
            {  # polygon square
                "id": 1, "image_id": 0, "category_id": 1,
                "bbox": [8.0, 8, 16, 16], "area": 256.0, "iscrowd": 0,
                "segmentation": [[8.0, 8, 24, 8, 24, 24, 8, 24]],
            },
            {  # NO segmentation -> box-filled fallback
                "id": 2, "image_id": 0, "category_id": 1,
                "bbox": [40.0, 40, 10, 10], "area": 100.0, "iscrowd": 0,
            },
        ],
        "categories": [{"id": 1, "name": "a"}],
    }
    f = tmp_path / "ann.json"
    f.write_text(json.dumps(ann))
    ds = CocoDetection(str(f), str(img_dir))
    _, _, _, masks = ds.load(0, with_masks=True)
    assert masks.shape == (2, size, size)
    assert masks[0].sum() == 16 * 16
    assert masks[1].sum() == 10 * 10

    (b,) = list(coco_batches(ds, 1, canvas_hw=(32, 32), max_gt=3,
                             shuffle=False, augment=False,
                             with_masks=True))
    assert b["gt_masks"].shape == (1, 3, 32, 32)
    # canvas halves the image: the 16x16 square mask becomes ~8x8
    area = b["gt_masks"][0, 0].sum()
    assert 36 <= area <= 100
    # mask sits where the scaled box sits
    gb = b["gt_boxes"][0, 0]
    ys, xs = np.where(b["gt_masks"][0, 0])
    assert abs(xs.min() - gb[0]) <= 1 and abs(ys.min() - gb[1]) <= 1
    assert not b["gt_masks"][0, 2].any()  # padded row empty


def test_coco_batches_eval_extras_crowd_and_areas(tmp_path):
    """with_eval_extras surfaces COCOeval inputs: letterbox scale, json
    areas (original scale), and crowd ignore regions (original coords)
    — which the training path still never sees."""
    import json as _json

    from PIL import Image

    from mrla_tpu.data.coco import CocoDetection, coco_batches

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    size = 64
    Image.fromarray(np.zeros((size, size, 3), np.uint8)).save(
        img_dir / "a.png"
    )
    ann = {
        "images": [{"id": 0, "file_name": "a.png",
                    "width": size, "height": size}],
        "annotations": [
            {"id": 1, "image_id": 0, "category_id": 1,
             "bbox": [8.0, 8, 16, 16], "area": 200.0, "iscrowd": 0},
            {"id": 2, "image_id": 0, "category_id": 1,
             "bbox": [30.0, 30, 20, 20], "area": 350.0, "iscrowd": 1},
        ],
        "categories": [{"id": 1, "name": "a"}],
    }
    f = tmp_path / "ann.json"
    f.write_text(_json.dumps(ann))
    ds = CocoDetection(str(f), str(img_dir))
    # crowd ann is not a training target
    _, boxes, labels = ds.load(0)
    assert len(boxes) == 1

    (b,) = list(coco_batches(ds, 1, canvas_hw=(32, 32), max_gt=3,
                             shuffle=False, augment=False,
                             with_eval_extras=True))
    np.testing.assert_allclose(b["scale"], [0.5])
    # areas stay ORIGINAL scale (the json field, not box area)
    np.testing.assert_allclose(b["gt_areas"][0, 0], 200.0)
    assert b["gt_areas"][0, 1] == 0.0  # padded row
    # crowd region in ORIGINAL coords with its json area
    assert b["crowd_valid"].shape == (1, 1)
    assert b["crowd_valid"][0, 0]
    np.testing.assert_allclose(b["crowd_boxes"][0, 0], [30, 30, 50, 50])
    np.testing.assert_allclose(b["crowd_areas"][0, 0], 350.0)
    assert b["crowd_labels"][0, 0] == 0
    # gt boxes themselves are canvas-scaled (divide by scale to undo)
    np.testing.assert_allclose(
        b["gt_boxes"][0, 0] / b["scale"][0], [8, 8, 24, 24]
    )
    # without the flag, none of the eval keys appear
    (b2,) = list(coco_batches(ds, 1, canvas_hw=(32, 32), max_gt=3,
                              shuffle=False, augment=False))
    for k in ("scale", "gt_areas", "crowd_boxes", "crowd_valid"):
        assert k not in b2
