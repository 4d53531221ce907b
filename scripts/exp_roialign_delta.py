#!/usr/bin/env python
"""Quantify the sr=2 static grid's deviation from the reference-exact
adaptive grid (sampling_ratio=0) through the REAL second stage.

The reference presets pin sampling_ratio=0 (faster_rcnn_r50mrlal_fpn.py:40);
the shipped default is the static 2x2 grid (13.6x faster — see
exp_roialign_adaptive.py).  This measures what that deviation does to
(a) pooled roi features, (b) bbox-head cls logits, (c) decoded boxes —
over the model's own RPN proposals AND a realistic COCO roi-scale mix,
on real backbone features (BN'd, structured), f32.  Recorded in
PARITY.md.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 2, 800, 1344


def realistic_rois(rng, p):
    scale = np.exp(rng.uniform(np.log(16.0), np.log(500.0), (B, p)))
    ar = np.exp(rng.uniform(np.log(1 / 3), np.log(3.0), (B, p)))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(0, W, (B, p))
    cy = rng.uniform(0, H, (B, p))
    r = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    return np.clip(r, [0, 0, 0, 0], [W, H, W, H]).astype(np.float32)


def main():
    from mrla_tpu.detect.roi_align import batched_roi_align
    from mrla_tpu.detect.two_stage import (
        ROI_STRIDES, FasterRCNN, init_detector, rcnn_detections,
    )

    model = FasterRCNN(layers=(3, 4, 6, 3), dtype=jnp.float32,
                       num_proposals=500)
    variables = jax.jit(lambda r, x: init_detector(model, r, x))(
        jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)

    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    feats = [f.astype(jnp.float32) for f in out["feats"][:4]]

    for name, rois, valid in (
        ("rpn proposals", out["proposals"], out["proposal_valid"]),
        ("realistic mix", jnp.asarray(realistic_rois(rng, 500)),
         jnp.ones((B, 500), bool)),
    ):
        pool = jax.jit(
            lambda sr, f=feats, r=rois, v=valid: batched_roi_align(
                f, r, v, strides=ROI_STRIDES, out_size=7,
                sampling_ratio=sr,
            ),
            static_argnums=0,
        )
        f2, f0 = np.asarray(pool(2)), np.asarray(pool(0))
        vmask = np.asarray(valid)
        rel = np.abs(f2 - f0)[vmask] / (np.abs(f0)[vmask].mean() + 1e-9)
        head = jax.jit(
            lambda rf: model.apply(
                variables, rf.astype(model.dtype), rois, valid,
                method=lambda m, rf, r, v: m.bbox_head(rf),
            )
        )
        # decoded detections from each grid
        def detect(rf):
            cls, reg = head(jnp.asarray(rf))
            return rcnn_detections(rois, valid, cls, reg,
                                   img_shape=(H, W))

        c2, r2 = head(jnp.asarray(f2))
        c0, r0 = head(jnp.asarray(f0))
        sm2 = jax.nn.softmax(c2, -1)
        sm0 = jax.nn.softmax(c0, -1)
        b2, s2, l2, v2 = detect(f2)
        b0, s0, l0, v0 = detect(f0)
        both = np.asarray(v2) & np.asarray(v0)
        print(f"--- {name} ({int(vmask.sum())} rois) ---")
        print(f"roi_feats |d|/mean|f0|: mean {rel.mean():.4f} "
              f"p99 {np.percentile(rel, 99):.4f} max {rel.max():.4f}")
        dl = np.abs(np.asarray(c2 - c0))[vmask]
        dp = np.abs(np.asarray(sm2 - sm0))[vmask]
        print(f"cls logits |d|: mean {dl.mean():.4f} max {dl.max():.4f}; "
              f"softmax |d|: mean {dp.mean():.5f} max {dp.max():.4f}")
        agree = (
            np.asarray(jnp.argmax(c2, -1) == jnp.argmax(c0, -1))[vmask]
            .mean()
        )
        print(f"argmax class agreement: {agree * 100:.2f}%")
        db = np.abs(np.asarray(b2 - b0))[both]
        print(f"decoded det boxes |d| px: mean {db.mean():.3f} "
              f"p99 {np.percentile(db, 99):.3f} max {db.max():.3f}; "
              f"kept-det agreement "
              f"{(np.asarray(v2) == np.asarray(v0)).mean() * 100:.2f}%")


if __name__ == "__main__":
    main()
