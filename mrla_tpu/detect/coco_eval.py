"""COCO-style detection mAP (host-side numpy evaluator).

The reference evaluates detection through upstream MMDetection, which
delegates to pycocotools' COCOeval (not available in this environment).
This re-implements the documented COCOeval bbox protocol so users can
score detections natively:

  * detections processed in descending score order, at most ``max_dets``
    (=100) per image;
  * a detection matches the not-yet-matched ground truth of ITS class
    with the highest IoU ≥ the threshold (greedy, per COCOeval);
  * AP per (class, IoU threshold) via 101-point interpolation
    (recall grid 0:.01:1, precision made monotone from the right);
  * mAP = mean over classes present in the ground truth and over the
    ten thresholds 0.50:0.05:0.95; AP50/AP75 are the usual slices.

Scope notes: ``iscrowd`` regions and area-range breakdowns (APs/m/l) are
outside the reference configs' reported headline metrics and omitted;
inputs are plain arrays, so the evaluator has no COCO-json dependency.
"""

from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)  # COCOeval's exact grid
RECALL_GRID = np.linspace(0.0, 1.0, 101)


def paste_masks(
    masks: np.ndarray,
    boxes: np.ndarray,
    img_hw,
    threshold: float = 0.5,
) -> np.ndarray:
    """Paste per-detection soft masks into image coordinates (host-side
    numpy — mmdet performs this step on CPU as well).

    masks [M, S, S] sigmoid outputs from the mask head, boxes [M, 4]
    xyxy -> [M, H, W] binary masks.  Bilinear resize of each S×S grid
    onto its box (mmcv ``_do_paste_mask`` semantics: mask cell centers
    span the box), thresholded at ``mask_thr_binary=0.5``
    (mask_rcnn_r50mrlal_fpn.py:121).
    """
    h, w = img_hw
    m, s, _ = masks.shape
    out = np.zeros((m, h, w), bool)
    for i in range(m):
        x1, y1, x2, y2 = boxes[i]
        bw, bh = x2 - x1, y2 - y1
        if bw <= 0 or bh <= 0:
            continue
        xs = np.arange(int(np.floor(x1)), int(np.ceil(x2)))
        ys = np.arange(int(np.floor(y1)), int(np.ceil(y2)))
        xs = xs[(xs >= 0) & (xs < w)]
        ys = ys[(ys >= 0) & (ys < h)]
        if not len(xs) or not len(ys):
            continue
        # pixel centers -> mask grid coords (cell centers at (k+.5)/S)
        gx = (xs + 0.5 - x1) / bw * s - 0.5
        gy = (ys + 0.5 - y1) / bh * s - 0.5
        gx0 = np.clip(np.floor(gx).astype(int), 0, s - 1)
        gy0 = np.clip(np.floor(gy).astype(int), 0, s - 1)
        gx1 = np.minimum(gx0 + 1, s - 1)
        gy1 = np.minimum(gy0 + 1, s - 1)
        fx = np.clip(gx - gx0, 0, 1)
        fy = np.clip(gy - gy0, 0, 1)
        mk = masks[i]
        top = mk[gy0[:, None], gx0[None, :]] * (1 - fx)[None, :] + mk[
            gy0[:, None], gx1[None, :]
        ] * fx[None, :]
        bot = mk[gy1[:, None], gx0[None, :]] * (1 - fx)[None, :] + mk[
            gy1[:, None], gx1[None, :]
        ] * fx[None, :]
        val = top * (1 - fy)[:, None] + bot * fy[:, None]
        out[i, ys[0] : ys[-1] + 1, xs[0] : xs[-1] + 1] = val >= threshold
    return out


def _iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    aa = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    ab = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    return inter / np.maximum(aa[:, None] + ab[None, :] - inter, 1e-10)


def _interp_ap(scores: np.ndarray, matched: np.ndarray, num_gt: int) -> float:
    """101-point interpolated AP from per-detection (score, hit) pairs."""
    if num_gt == 0:
        return float("nan")
    if len(scores) == 0:
        return 0.0
    order = np.argsort(-scores, kind="mergesort")
    tp = matched[order].astype(np.float64)
    fp = 1.0 - tp
    tp_cum = np.cumsum(tp)
    fp_cum = np.cumsum(fp)
    recall = tp_cum / num_gt
    precision = tp_cum / np.maximum(tp_cum + fp_cum, 1e-10)
    # monotone envelope from the right (COCOeval)
    for i in range(len(precision) - 1, 0, -1):
        precision[i - 1] = max(precision[i - 1], precision[i])
    # precision at the first recall index reaching each grid point
    idx = np.searchsorted(recall, RECALL_GRID, side="left")
    p = np.zeros_like(RECALL_GRID)
    ok = idx < len(precision)
    p[ok] = precision[idx[ok]]
    return float(p.mean())


def _mask_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pixel IoU between boolean mask sets: a [N, H, W], b [M, H, W]."""
    if len(a) == 0 or len(b) == 0:
        return np.zeros((len(a), len(b)), np.float64)
    af = a.reshape(len(a), -1).astype(np.float64)
    bf = b.reshape(len(b), -1).astype(np.float64)
    inter = af @ bf.T
    area_a = af.sum(1)
    area_b = bf.sum(1)
    return inter / np.maximum(area_a[:, None] + area_b[None, :] - inter,
                              1e-10)


def evaluate_detections(
    predictions: Sequence[Mapping[str, np.ndarray]],
    ground_truths: Sequence[Mapping[str, np.ndarray]],
    num_classes: int,
    iou_thrs: Optional[np.ndarray] = None,
    max_dets: int = 100,
    iou_kind: str = "bbox",
) -> Dict[str, float]:
    """predictions / ground_truths: one mapping per image with keys
    ``boxes`` [N, 4] xyxy, ``labels`` [N] int, and (predictions only)
    ``scores`` [N].  Rows may include padding — pass only valid rows or
    filter with a ``valid`` mask beforehand.

    ``iou_kind="segm"`` scores instance segmentation instead (COCOeval
    segm protocol): both sides must then also carry ``masks`` [N, H, W]
    boolean arrays (predictions pasted to image resolution, e.g. via
    :func:`paste_masks`), and matching uses pixel IoU; scores/labels
    still come from the detection head.

    Returns {"mAP", "AP50", "AP75", "AP@<thr>": ..., "per_class": {...}}.
    """
    if iou_thrs is None:
        iou_thrs = IOU_THRS
    assert len(predictions) == len(ground_truths)
    assert iou_kind in ("bbox", "segm")

    # per (class, thr): accumulate detection scores + hit flags
    ap = np.full((num_classes, len(iou_thrs)), np.nan)
    for cls in range(num_classes):
        scores_all: List[np.ndarray] = []
        hits_all: List[List[np.ndarray]] = [[] for _ in iou_thrs]
        num_gt = 0
        for pred, gt in zip(predictions, ground_truths):
            g_boxes = np.asarray(gt["boxes"], np.float64).reshape(-1, 4)
            g_lab = np.asarray(gt["labels"]).reshape(-1)
            g_sel = g_lab == cls
            g_boxes = g_boxes[g_sel]
            num_gt += len(g_boxes)
            p_boxes = np.asarray(pred["boxes"], np.float64).reshape(-1, 4)
            p_lab = np.asarray(pred["labels"]).reshape(-1)
            p_scores = np.asarray(pred["scores"], np.float64).reshape(-1)
            sel = p_lab == cls
            p_boxes, p_scores = p_boxes[sel], p_scores[sel]
            order = np.argsort(-p_scores, kind="mergesort")[:max_dets]
            p_boxes, p_scores = p_boxes[order], p_scores[order]
            scores_all.append(p_scores)
            if iou_kind == "segm":
                g_masks = np.asarray(gt["masks"], bool)[g_sel]
                p_masks = np.asarray(pred["masks"], bool)[sel][order]
                iou = _mask_iou(p_masks, g_masks)
            else:
                iou = _iou(p_boxes, g_boxes)
            for ti, thr in enumerate(iou_thrs):
                taken = np.zeros(len(g_boxes), bool)
                hit = np.zeros(len(p_boxes), bool)
                for di in range(len(p_boxes)):
                    if len(g_boxes) == 0:
                        break
                    cand = np.where(~taken & (iou[di] >= thr))[0]
                    if cand.size:
                        best = cand[np.argmax(iou[di][cand])]
                        taken[best] = True
                        hit[di] = True
                hits_all[ti].append(hit)
        scores_cat = (
            np.concatenate(scores_all) if scores_all else np.zeros(0)
        )
        for ti in range(len(iou_thrs)):
            hits_cat = (
                np.concatenate(hits_all[ti])
                if hits_all[ti]
                else np.zeros(0, bool)
            )
            ap[cls, ti] = _interp_ap(scores_cat, hits_cat, num_gt)

    present = ~np.isnan(ap[:, 0])
    res: Dict[str, float] = {}
    res["mAP"] = float(np.nanmean(ap[present])) if present.any() else 0.0
    for ti, thr in enumerate(iou_thrs):
        key = f"AP@{thr:.2f}"
        res[key] = (
            float(np.nanmean(ap[present, ti])) if present.any() else 0.0
        )
    res["AP50"] = res.get("AP@0.50", 0.0)
    res["AP75"] = res.get("AP@0.75", 0.0)
    res["per_class"] = {
        int(c): float(np.nanmean(ap[c]))
        for c in range(num_classes)
        if present[c]
    }
    return res
