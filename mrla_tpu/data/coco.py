"""COCO-format detection dataset (stdlib json — no pycocotools).

The reference trains detection through MMDetection's CocoDataset with the
coco_detection.py pipeline (upstream, not vendored): resize keep-ratio to
an (max_w, max_h)=(1333, 800) scale, random horizontal flip p=.5,
normalize with the torchvision mean/std, pad to a stride-32-divisible
canvas, batch 2/GPU × 8.  This loader reproduces that contract at FIXED
shapes (TPU discipline):

  * every image is keep-ratio resized to fit the static canvas
    (default 800×1344, both divisible by 32) and zero-padded
    bottom/right; boxes scale with the image;
  * gt boxes/labels are padded to ``max_gt`` with a validity mask;
  * labels are contiguous [0, num_classes) via the category-id map
    (COCO ids are sparse), in sorted category-id order — mmdet's
    ``cat2label`` convention;
  * annotations with ``iscrowd=1`` or zero width/height are dropped
    (mmdet filters these for training).

Masks: polygon/RLE rasterization is out of scope here (mmdet uses
pycocotools); Mask R-CNN training from COCO json therefore needs
externally-provided masks — the synthetic task covers the mask-loss path.
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

# torchvision-convention normalization, as in the reference pipelines
MEAN = np.array([123.675, 116.28, 103.53], np.float32)
STD = np.array([58.395, 57.12, 57.375], np.float32)


class CocoDetection:
    """Index over a COCO instances json + image directory."""

    def __init__(self, ann_file: str, img_dir: str,
                 filter_empty: bool = True):
        with open(ann_file) as f:
            coco = json.load(f)
        self.img_dir = img_dir
        cat_ids = sorted(c["id"] for c in coco.get("categories", []))
        self.cat2label = {cid: i for i, cid in enumerate(cat_ids)}
        self.num_classes = len(cat_ids)
        anns_by_img: Dict[int, List[dict]] = {}
        for a in coco.get("annotations", []):
            if a.get("iscrowd", 0):
                continue
            x, y, w, h = a["bbox"]  # COCO xywh
            if w <= 0 or h <= 0:
                continue
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self.items: List[Tuple[dict, List[dict]]] = []
        for img in coco["images"]:
            anns = anns_by_img.get(img["id"], [])
            if filter_empty and not anns:
                continue
            self.items.append((img, anns))

    def __len__(self) -> int:
        return len(self.items)

    def load(self, i: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """-> (image uint8 [H, W, 3], boxes [N, 4] xyxy, labels [N])."""
        from PIL import Image

        info, anns = self.items[i]
        img = Image.open(
            os.path.join(self.img_dir, info["file_name"])
        ).convert("RGB")
        arr = np.asarray(img, np.uint8)
        boxes, labels = [], []
        for a in anns:
            x, y, w, h = a["bbox"]
            boxes.append([x, y, x + w, y + h])
            labels.append(self.cat2label[a["category_id"]])
        return (
            arr,
            np.asarray(boxes, np.float32).reshape(-1, 4),
            np.asarray(labels, np.int32),
        )


def letterbox(
    img: np.ndarray,
    boxes: np.ndarray,
    canvas_hw: Tuple[int, int],
) -> Tuple[np.ndarray, np.ndarray, Tuple[int, int]]:
    """Keep-ratio resize into the top-left of a fixed canvas (mmdet
    Resize(keep_ratio=True) + Pad(size_divisor=32), which also pads
    bottom/right).  Returns (float32 canvas NOT normalized, boxes,
    (resized_h, resized_w) — the content region, needed so flips mirror
    the IMAGE, not the padding)."""
    from PIL import Image

    ch, cw = canvas_hw
    h, w = img.shape[:2]
    scale = min(ch / h, cw / w)
    nh, nw = int(round(h * scale)), int(round(w * scale))
    resized = np.asarray(
        Image.fromarray(img).resize((nw, nh), Image.BILINEAR), np.float32
    )
    canvas = np.zeros((ch, cw, 3), np.float32)
    canvas[:nh, :nw] = resized
    return canvas, boxes * scale, (nh, nw)


def hflip(
    img: np.ndarray, boxes: np.ndarray, content_w: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """Horizontal flip of the CONTENT region (mmdet flips before padding,
    so the pad stays on the right)."""
    w = content_w if content_w is not None else img.shape[1]
    out = boxes.copy()
    if len(boxes):
        out[:, 0] = w - boxes[:, 2]
        out[:, 2] = w - boxes[:, 0]
    img = img.copy()
    img[:, :w] = img[:, :w][:, ::-1]
    return img, out


def coco_batches(
    ds: CocoDetection,
    batch_size: int,
    canvas_hw: Tuple[int, int] = (800, 1344),
    max_gt: int = 100,
    shuffle: bool = True,
    augment: bool = True,
    seed: int = 0,
    indices: Optional[Sequence[int]] = None,
) -> Iterator[Dict[str, np.ndarray]]:
    """Fixed-shape batches: images [B, H, W, 3] normalized float32,
    gt_boxes [B, max_gt, 4], gt_labels [B, max_gt], gt_valid [B, max_gt].
    The final ragged batch pads by repeating row 0 with ``sample_valid``
    false (mirrors the classification eval contract)."""
    rng = np.random.RandomState(seed)
    idx = np.asarray(indices if indices is not None else np.arange(len(ds)))
    if shuffle:
        rng.shuffle(idx)
    for start in range(0, len(idx), batch_size):
        chunk = idx[start : start + batch_size]
        imgs, bxs, lbs, valid, svalid = [], [], [], [], []
        for i in chunk:
            img, boxes, labels = ds.load(int(i))
            img, boxes, (nh, nw) = letterbox(img, boxes, canvas_hw)
            if augment and rng.rand() < 0.5:
                img, boxes = hflip(img, boxes, content_w=nw)
            img = (img - MEAN) / STD
            n = min(len(boxes), max_gt)
            pb = np.zeros((max_gt, 4), np.float32)
            pl = np.zeros((max_gt,), np.int32)
            pv = np.zeros((max_gt,), bool)
            pb[:n], pl[:n], pv[:n] = boxes[:n], labels[:n], True
            imgs.append(img)
            bxs.append(pb)
            lbs.append(pl)
            valid.append(pv)
            svalid.append(True)
        while len(imgs) < batch_size:  # ragged tail: repeat row 0
            imgs.append(imgs[0])
            bxs.append(bxs[0])
            lbs.append(lbs[0])
            valid.append(valid[0])
            svalid.append(False)
        yield {
            "image": np.stack(imgs),
            "gt_boxes": np.stack(bxs),
            "gt_labels": np.stack(lbs),
            "gt_valid": np.stack(valid),
            "sample_valid": np.asarray(svalid),
        }
