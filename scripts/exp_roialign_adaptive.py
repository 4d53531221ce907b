#!/usr/bin/env python
"""Adaptive (sampling_ratio=0, mmcv-exact) RoIAlign cost on the chip.

Isolated stage at the COCO working point (8x1000 rois, realistic COCO
scale mix) for sr in {0 (max_grid 7), 0 (max_grid 4), 1, 2}, then
faster_rcnn e2e with sr=0 vs the shipped sr=2 — the numbers that decide
the preset default (VERDICT round-3 item 1).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, P, C = 8, 1000, 256
SIZES = [(200, 336), (100, 168), (50, 84), (25, 42)]
STRIDES = (4, 8, 16, 32)
ITERS = 20


def realistic_rois(rng):
    """COCO-ish mix: log-uniform scales 16..500 px, aspect 1:3..3:1."""
    scale = np.exp(rng.uniform(np.log(16.0), np.log(500.0), (B, P)))
    ar = np.exp(rng.uniform(np.log(1 / 3), np.log(3.0), (B, P)))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(0, 1344, (B, P))
    cy = rng.uniform(0, 800, (B, P))
    return np.stack(
        [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1
    ).astype(np.float32)


def main():
    from mrla_tpu.detect.roi_align import batched_roi_align

    rng = np.random.default_rng(0)
    feats = [
        jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.float32)
        for h, w in SIZES
    ]
    rois = jnp.asarray(realistic_rois(rng))
    valid = jnp.ones((B, P), bool)

    def bench(sr, max_grid=None):
        @jax.jit
        def run(feats, rois):
            def body(carry, _):
                rr = rois + carry * 1e-20
                out = batched_roi_align(
                    list(feats), rr, valid, strides=STRIDES, out_size=7,
                    sampling_ratio=sr, max_grid=max_grid,
                )
                return jnp.sum(out[:, 0, 0, 0].astype(jnp.float32)), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        float(run(feats, rois))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(feats, rois))
            times.append(time.perf_counter() - t0)
        dt = min(times) / ITERS * 1e3
        print(f"  sr={sr} max_grid={max_grid}: {dt:.1f} ms/call", flush=True)
        return dt

    print("isolated batched_roi_align, 8x1000 realistic COCO rois:")
    bench(2)
    bench(1)
    bench(0)          # default max_grid = 7
    bench(0, max_grid=4)

    # ---- e2e: faster_rcnn with the adaptive grid vs shipped sr=2
    from mrla_tpu.detect.two_stage import (
        FasterRCNN, init_detector, rcnn_detections,
    )

    H, W, iters = 800, 1344, 10
    for sr in (2, 0):
        model = FasterRCNN(
            layers=(3, 4, 6, 3), dtype=jnp.bfloat16,
            num_proposals=1000, roi_sampling_ratio=sr,
        )
        variables = jax.jit(
            lambda r, x: init_detector(model, r, x)
        )(jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32))
        x = jax.device_put(
            jnp.asarray(
                np.random.default_rng(0).standard_normal((B, H, W, 3)),
                jnp.bfloat16,
            )
        )

        @jax.jit
        def run_many(v, x, model=model):
            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                out = model.apply(v, xx, train=False)
                boxes, scores, labels, valid = rcnn_detections(
                    out["proposals"], out["proposal_valid"], out["cls"],
                    out["reg"], img_shape=(H, W),
                )
                s = (
                    jnp.sum(boxes[:, 0].astype(jnp.float32))
                    + jnp.sum(scores[:, 0])
                )
                return s, None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=iters)
            return carry

        float(run_many(variables, x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_many(variables, x))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(
            f"faster_rcnn e2e sr={sr}: {B * iters / dt:.1f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
