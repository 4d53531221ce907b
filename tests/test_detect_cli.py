"""Detection trainer CLI + COCO-json loader.

Drives `python -m mrla_tpu.detect.train_cli` in-process on tiny configs:
synthetic squares for retinanet and faster presets, and a generated
COCO-format dataset for the loader path.
"""

import json
import os

import numpy as np
import pytest

from mrla_tpu.detect.train_cli import main as cli_main


def _run(argv):
    return cli_main(argv)


def test_retinanet_cli_synthetic(tmp_path):
    out = _run([
        "--preset", "retinanet_r50mrlal_fpn_1x_coco",
        "--data", "synthetic-detect",
        "--backbone-layers", "1", "1", "1", "1",
        "--img-size", "128",
        "--num-classes", "3",
        "--max-gt", "4",
        "--batch-size", "2",
        "--epochs", "1",
        "--steps-per-epoch", "3",
        "--eval-steps", "2",
        "--warmup-iters", "10",
        "--output-dir", str(tmp_path / "run"),
    ])
    assert np.isfinite(out["best_map"])
    log = (tmp_path / "run" / "log.jsonl").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert "loss" in rec and np.isfinite(rec["loss"])
    assert "mAP" in rec
    assert os.path.exists(tmp_path / "run" / "checkpoint")
    # eval-only on the saved run (the reference -e flow)
    out2 = _run([
        "--preset", "retinanet_r50mrlal_fpn_1x_coco",
        "--data", "synthetic-detect",
        "--backbone-layers", "1", "1", "1", "1",
        "--img-size", "128",
        "--num-classes", "3",
        "--max-gt", "4",
        "--batch-size", "2",
        "--eval-steps", "2",
        "--eval-only",
        "--resume", str(tmp_path / "run"),
        "--output-dir", str(tmp_path / "run"),
    ])
    assert "mAP" in out2 and np.isfinite(out2["mAP"])


@pytest.mark.slow
def test_faster_rcnn_cli_synthetic_and_resume(tmp_path):
    args = [
        "--preset", "faster_rcnn_r50mrlal_fpn_1x_coco",
        "--data", "synthetic-detect",
        "--backbone-layers", "1", "1", "1", "1",
        "--img-size", "128",
        "--num-classes", "3",
        "--max-gt", "4",
        "--batch-size", "2",
        "--steps-per-epoch", "2",
        "--eval-steps", "1",
        "--rpn-proposals", "20",
        "--rcnn-samples", "16",
        "--warmup-iters", "10",
        "--output-dir", str(tmp_path / "run"),
    ]
    _run(args + ["--epochs", "1"])
    # resume continues into epoch 2 without re-initializing
    _run(args + ["--epochs", "2", "--resume", str(tmp_path / "run")])
    log = (tmp_path / "run" / "log.jsonl").read_text().strip().splitlines()
    epochs = [json.loads(l)["epoch"] for l in log]
    assert epochs == [0, 1]
    for l in log:
        assert np.isfinite(json.loads(l)["loss"])


def _write_tiny_coco(tmp_path, n_imgs=4, size=96):
    from PIL import Image

    rng = np.random.RandomState(0)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    images, annotations = [], []
    aid = 1
    for i in range(n_imgs):
        arr = (rng.rand(size, size, 3) * 60).astype(np.uint8)
        x0, y0 = rng.randint(4, size // 2, 2)
        s = rng.randint(16, size // 3)
        cls_pos = int(rng.randint(0, 2))
        arr[y0:y0 + s, x0:x0 + s, cls_pos] = 220
        Image.fromarray(arr).save(img_dir / f"{i:04d}.png")
        images.append({"id": i, "file_name": f"{i:04d}.png",
                       "width": size, "height": size})
        # category ids deliberately sparse (7, 13) to test cat2label
        annotations.append({
            "id": aid, "image_id": i,
            "category_id": [7, 13][cls_pos],
            "bbox": [float(x0), float(y0), float(s), float(s)],
            "area": float(s * s), "iscrowd": 0,
        })
        aid += 1
    # one crowd + one degenerate annotation must be filtered
    annotations.append({"id": aid, "image_id": 0, "category_id": 7,
                        "bbox": [0, 0, 10, 10], "area": 100, "iscrowd": 1})
    annotations.append({"id": aid + 1, "image_id": 0, "category_id": 7,
                        "bbox": [5, 5, 0, 3], "area": 0, "iscrowd": 0})
    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": 7, "name": "a"}, {"id": 13, "name": "b"}],
    }
    ann_file = tmp_path / "ann.json"
    ann_file.write_text(json.dumps(ann))
    return str(ann_file), str(img_dir)


def test_coco_loader(tmp_path):
    from mrla_tpu.data.coco import CocoDetection, coco_batches

    ann, imgs = _write_tiny_coco(tmp_path)
    ds = CocoDetection(ann, imgs)
    assert len(ds) == 4
    assert ds.num_classes == 2
    assert ds.cat2label == {7: 0, 13: 1}
    img, boxes, labels = ds.load(0)
    assert img.dtype == np.uint8 and img.shape == (96, 96, 3)
    assert boxes.shape[0] == 1  # crowd + degenerate filtered
    batches = list(coco_batches(ds, batch_size=3, canvas_hw=(64, 96),
                                max_gt=5, seed=1))
    assert len(batches) == 2  # 4 imgs -> 3 + ragged 1(+2 pad)
    b = batches[0]
    assert b["image"].shape == (3, 64, 96, 3)
    assert b["gt_boxes"].shape == (3, 5, 4)
    assert b["gt_valid"].sum() == 3
    assert b["sample_valid"].all()
    tail = batches[1]
    assert tail["sample_valid"].tolist() == [True, False, False]
    # letterbox: scale = min(64/96, 96/96) = 2/3 -> boxes scaled
    gv = tail["gt_valid"][0]
    assert (tail["gt_boxes"][0][gv] <= 96 * 2 / 3 + 1e-5).all()


def test_coco_cli_end_to_end(tmp_path):
    ann, imgs = _write_tiny_coco(tmp_path)
    out = _run([
        "--preset", "retinanet_r50mrlal_fpn_1x_coco",
        "--data", "coco",
        "--train-ann", ann, "--train-imgs", imgs,
        "--backbone-layers", "1", "1", "1", "1",
        "--img-size", "96",
        "--num-classes", "2",
        "--max-gt", "4",
        "--batch-size", "2",
        "--epochs", "1",
        "--eval-steps", "1",
        "--warmup-iters", "5",
        "--output-dir", str(tmp_path / "run"),
    ])
    assert np.isfinite(out["best_map"])


@pytest.mark.slow
def test_mask_rcnn_cli_synthetic_segm_eval(tmp_path):
    """Mask preset end to end: mask loss trains and eval reports BOTH
    bbox and segm (mask) mAP."""
    out = _run([
        "--preset", "mask_rcnn_r50mrlal_fpn_1x_coco",
        "--data", "synthetic-detect",
        "--backbone-layers", "1", "1", "1", "1",
        "--img-size", "128",
        "--num-classes", "3",
        "--max-gt", "4",
        "--batch-size", "2",
        "--epochs", "1",
        "--steps-per-epoch", "2",
        "--eval-steps", "1",
        "--rpn-proposals", "20",
        "--rcnn-samples", "16",
        "--warmup-iters", "10",
        "--output-dir", str(tmp_path / "run"),
    ])
    log = (tmp_path / "run" / "log.jsonl").read_text().strip().splitlines()
    rec = json.loads(log[-1])
    assert "loss_mask" in rec and np.isfinite(rec["loss_mask"])
    assert "mask_mAP" in rec and np.isfinite(rec["mask_mAP"])
    assert "mAP" in rec


@pytest.mark.slow
def test_retinanet_cli_dp8(tmp_path):
    """--dp 8 trains on the virtual 8-device mesh (conftest backend)."""
    import jax

    assert jax.device_count() >= 8
    out = _run([
        "--preset", "retinanet_r50mrlal_fpn_1x_coco",
        "--data", "synthetic-detect",
        "--backbone-layers", "1", "1", "1", "1",
        "--img-size", "128",
        "--num-classes", "3",
        "--max-gt", "4",
        "--batch-size", "8",
        "--dp", "8",
        "--epochs", "1",
        "--steps-per-epoch", "2",
        "--eval-steps", "1",
        "--warmup-iters", "10",
        "--output-dir", str(tmp_path / "run"),
    ])
    assert np.isfinite(out["best_map"])
    log = (tmp_path / "run" / "log.jsonl").read_text().strip().splitlines()
    assert np.isfinite(json.loads(log[-1])["loss"])


def test_pretrained_backbone_graft_from_classification_run(tmp_path):
    """The reference's init_cfg=Pretrained flow end to end: train a tiny
    classification run through train/cli.py, then start detection
    training FROM that checkpoint via --pretrained-backbone — backbone
    params must equal the classification run's, neck/head fresh."""
    import jax
    from mrla_tpu.train import cli as train_cli

    cls_dir = tmp_path / "cls"
    train_cli.main([
        "-a", "resnet50_mrlal",
        "--data", "synthetic",
        "--num-classes", "4",
        "--image-size", "64",
        "-b", "8",
        "--epochs", "1",
        "--synthetic-steps", "2",
        "--output-dir", str(cls_dir),
    ])

    # tiny 1-1-1-1 detect backbone grafts from the FULL-depth run: its
    # blocks are a key-subset with identical shapes (stem, layerK_0)
    out = _run([
        "--preset", "retinanet_r50mrlal_fpn_1x_coco",
        "--data", "synthetic-detect",
        "--backbone-layers", "1", "1", "1", "1",
        "--img-size", "128",
        "--num-classes", "3",
        "--max-gt", "4",
        "--batch-size", "2",
        "--epochs", "1",
        "--steps-per-epoch", "1",
        "--eval-every", "0",
        "--warmup-iters", "5",
        "--pretrained-backbone", str(cls_dir),
        "--output-dir", str(tmp_path / "det"),
    ])
    assert np.isfinite(json.loads(
        (tmp_path / "det" / "log.jsonl").read_text().splitlines()[-1]
    )["loss"])

    # the grafted backbone must MATCH the classification run pre-training:
    # compare stem conv kernels (classification checkpoint vs a fresh
    # detect init with the same flag — one optimizer step of lr~warmup
    # ratio moves them only ~1e-5)
    from mrla_tpu.ckpt.orbax_io import restore_checkpoint

    import flax

    cls_state = restore_checkpoint(str(cls_dir))[0]
    det_state = restore_checkpoint(str(tmp_path / "det"))[0]
    a = flax.traverse_util.flatten_dict(cls_state["params"]["stem"])
    b = flax.traverse_util.flatten_dict(
        det_state["params"]["backbone"]["stem"]
    )
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_allclose(
            np.asarray(a[k]), np.asarray(b[k]), atol=5e-3,
            err_msg=str(k),
        )
    assert any(not np.allclose(np.asarray(v), 0) for v in a.values())


@pytest.mark.slow
def test_mask_rcnn_cli_coco_segmentation(tmp_path):
    """Mask preset from a COCO json WITH polygon segmentations: the
    decoded gt masks reach the mask loss (loss_mask in the log)."""
    from PIL import Image

    rng = np.random.RandomState(1)
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    size = 96
    images, annotations = [], []
    for i in range(2):
        arr = (rng.rand(size, size, 3) * 60).astype(np.uint8)
        x0, y0, s = 20, 24, 32
        arr[y0:y0 + s, x0:x0 + s, 0] = 220
        Image.fromarray(arr).save(img_dir / f"{i}.png")
        images.append({"id": i, "file_name": f"{i}.png",
                       "width": size, "height": size})
        annotations.append({
            "id": i + 1, "image_id": i, "category_id": 1,
            "bbox": [float(x0), float(y0), float(s), float(s)],
            "area": float(s * s), "iscrowd": 0,
            "segmentation": [[float(x0), float(y0), float(x0 + s),
                              float(y0), float(x0 + s), float(y0 + s),
                              float(x0), float(y0 + s)]],
        })
    ann = tmp_path / "ann.json"
    ann.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "a"}],
    }))
    _run([
        "--preset", "mask_rcnn_r50mrlal_fpn_1x_coco",
        "--data", "coco",
        "--train-ann", str(ann), "--train-imgs", str(img_dir),
        "--backbone-layers", "1", "1", "1", "1",
        "--img-size", "96",
        "--num-classes", "1",
        "--max-gt", "2",
        "--batch-size", "2",
        "--epochs", "1",
        "--eval-every", "0",
        "--rpn-proposals", "20",
        "--rcnn-samples", "8",
        "--warmup-iters", "5",
        "--output-dir", str(tmp_path / "run"),
    ])
    rec = json.loads(
        (tmp_path / "run" / "log.jsonl").read_text().splitlines()[-1]
    )
    assert "loss_mask" in rec and np.isfinite(rec["loss_mask"])


def test_roi_backend_resolution():
    """Round-5 backend/grid defaults: 'auto' -> xla on CPU (pallas is
    TPU-only), sr default 2 on xla / 0 on pallas; explicit pallas with a
    retinanet preset is rejected (no RoIAlign there)."""
    from mrla_tpu.detect.train_cli import build_model, parse_args

    args = parse_args([
        "--preset", "faster_rcnn_r50mrlal_fpn_1x_coco",
        "--backbone-layers", "1", "1", "1", "1",
    ])
    model, kind = build_model(args)
    assert kind == "two_stage"
    # CPU test env: auto resolves to the differentiable XLA gather with
    # the close static 2x2 grid
    assert model.roi_backend == "xla"
    assert model.roi_sampling_ratio == 2

    args = parse_args([
        "--preset", "faster_rcnn_r50mrlal_fpn_1x_coco",
        "--backbone-layers", "1", "1", "1", "1",
        "--roi-backend", "pallas",
    ])
    model, _ = build_model(args)
    # explicit pallas: the reference presets' exact adaptive grid is the
    # default there (it costs nothing on that backend)
    assert model.roi_backend == "pallas"
    assert model.roi_sampling_ratio == 0

    args = parse_args([
        "--preset", "faster_rcnn_r50mrlal_fpn_1x_coco",
        "--backbone-layers", "1", "1", "1", "1",
        "--roi-backend", "pallas", "--roi-sampling-ratio", "2",
    ])
    model, _ = build_model(args)
    assert model.roi_sampling_ratio == 2  # explicit sr wins

    args = parse_args([
        "--preset", "retinanet_r50mrlal_fpn_1x_coco",
        "--roi-backend", "pallas",
    ])
    with pytest.raises(SystemExit):
        build_model(args)


def test_rank_shard_indices_step_counts_agree():
    """Round-5 review finding: per-rank truncation of strided shards can
    give ranks DIFFERENT step counts (ceil-vs-floor shard lengths) and
    deadlock the first collective of the extra step.  Every (n, world,
    local_bs) must yield equal step counts and disjoint indices."""
    from mrla_tpu.detect.train_cli import rank_shard_indices

    for n in (15, 16, 17, 63, 100, 117266):
        for world in (2, 4, 8):
            for local_bs in (1, 2, 4):
                shards = [
                    rank_shard_indices(n, r, world, local_bs)
                    for r in range(world)
                ]
                if shards[0] is None:
                    assert all(s is None for s in shards)
                    continue
                steps = {len(s) // local_bs for s in shards}
                lens = {len(s) for s in shards}
                assert steps == {len(shards[0]) // local_bs}, (
                    n, world, local_bs)
                assert lens == {len(shards[0])}
                assert len(shards[0]) % local_bs == 0
                flat = np.concatenate(shards)
                assert len(np.unique(flat)) == len(flat)  # disjoint
                assert flat.max() < n
