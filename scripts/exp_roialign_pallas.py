#!/usr/bin/env python
"""Patch-DMA Pallas RoIAlign vs the shipped XLA flat-take, on the chip.

VERDICT round-3 item 4: the one idea the round-3 autopsy never measured
against the dominant faster_rcnn cost — a DMA per ROI instead of a
gather per sample row (`kernels/roialign_patch.py`).  Same harness as
exp_roialign_adaptive.py: 8x1000 realistic COCO rois, honest scan-based
timing with a carried data dependency.
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
    from mrla_tpu.kernels.roialign_patch import roi_align_patch

    rng = np.random.default_rng(0)
    rois = jnp.asarray(realistic_rois(rng))
    valid = jnp.ones((B, P), bool)

    def bench(name, fn, dtype, sr):
        feats = [
            jnp.asarray(rng.standard_normal((B, h, w, C)), dtype)
            for h, w in SIZES
        ]

        @jax.jit
        def run(feats, rois):
            def body(carry, _):
                rr = rois + carry * 1e-20
                out = fn(
                    list(feats), rr, valid, strides=STRIDES, out_size=7,
                    sampling_ratio=sr,
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
        print(f"  {name} sr={sr} {dtype.__name__}: {dt:.1f} ms/call",
              flush=True)
        return dt

    # correctness on-chip first (fp32, realistic rois)
    feats32 = [
        jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.float32)
        for h, w in SIZES
    ]
    for sr in (2, 0):
        ref = batched_roi_align(feats32, rois, valid, strides=STRIDES,
                                sampling_ratio=sr)
        got = roi_align_patch(feats32, rois, valid, strides=STRIDES,
                              sampling_ratio=sr)
        rel = float(jnp.max(jnp.abs(ref - got))) / float(
            jnp.max(jnp.abs(ref)))
        print(f"on-chip parity sr={sr}: rel {rel:.2e}", flush=True)
        assert rel < 2e-3, rel

    print("isolated stage, 8x1000 realistic COCO rois:")
    for sr in (2, 1, 0):
        bench("xla-flat-take", batched_roi_align, jnp.float32, sr)
        bench("pallas-patch ", roi_align_patch, jnp.float32, sr)
    bench("pallas-patch ", roi_align_patch, jnp.bfloat16, 0)
    bench("xla-flat-take", batched_roi_align, jnp.bfloat16, 2)


if __name__ == "__main__":
    main()
