#!/usr/bin/env python
"""Mask R-CNN e2e serving row (round-5 VERDICT weak #7).

The round-4 ledger's two-stage e2e numbers are faster_rcnn only; the
mask preset adds the second RoIAlign (14x14 over the top-100 detections,
mask_rcnn_r50mrlal_fpn.py:59 sr=0) and the FCN mask head.  This
measures the FULL serving path the daemon runs — two_stage_predict with
28x28 soft masks — at the mmdet contract (bs8 800x1344 bf16, 1000
proposals), pallas backend sr=0 (the serving default) beside the
faster_rcnn row for the delta, plus faster_rcnn via the same
two_stage_predict harness so the comparison is apples-to-apples.

Usage: exp_mask_e2e.py [pallas|xla ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, H, W = 8, 800, 1344
ITERS = 10


def bench(tag, model, v, x, with_masks):
    from mrla_tpu.detect.two_stage import two_stage_predict

    @jax.jit
    def run(v, x):
        def step(carry, _):
            xx = x + (carry * 1e-20).astype(x.dtype)
            res = two_stage_predict(model, v, xx, score_thr=0.05,
                                    max_per_img=100)
            s = jnp.sum(res["det_boxes"][:, 0].astype(jnp.float32))
            if with_masks:
                s = s + jnp.sum(
                    res["masks"][:, 0, 0].astype(jnp.float32))
            return s * 1e-20, None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=ITERS)
        return c

    float(run(v, x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(v, x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    print(f"  {tag}: {dt*1e3:.1f} ms/img-batch = {B/dt:.1f} img/s",
          flush=True)


def main():
    from mrla_tpu.detect.two_stage import (
        FasterRCNN, MaskRCNN, init_detector)

    backends = sys.argv[1:] or ["pallas"]
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((B, H, W, 3)),
            jnp.bfloat16,
        )
    )
    print(f"two_stage_predict e2e, bs{B} {H}x{W} bf16, 1000 proposals, "
          f"max_per_img=100:", flush=True)
    for backend in backends:
        sr = 0 if backend == "pallas" else 2
        for name, cls, masks in (
            ("faster_rcnn", FasterRCNN, False),
            ("mask_rcnn  ", MaskRCNN, True),
        ):
            model = cls(
                layers=(3, 4, 6, 3), dtype=jnp.bfloat16,
                num_proposals=1000, roi_sampling_ratio=sr,
                roi_backend=backend,
            )
            v = jax.jit(lambda r, xx: init_detector(model, r, xx))(
                jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32)
            )
            bench(f"{name} {backend} sr={sr}", model, v, x, masks)


if __name__ == "__main__":
    main()
