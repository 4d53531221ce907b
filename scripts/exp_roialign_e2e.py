#!/usr/bin/env python
"""faster_rcnn e2e with the patch-DMA Pallas RoIAlign vs the XLA
flat-take, at sr=2 (shipped default) and sr=0 (reference-exact adaptive
grid).  Honest input-perturbed scan at the mmdet contract (bs8 800x1344
bf16, 1000 proposals)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 800, 1344
ITERS = 10


def main():
    from mrla_tpu.detect.two_stage import (
        FasterRCNN, init_detector, rcnn_detections)

    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((B, H, W, 3)),
            jnp.bfloat16,
        )
    )

    # XLA rows are already in the ROADMAP ledger (49.9 img/s sr=2 /
    # 6.1 sr=0); pass 'xla' to re-measure them
    backends = sys.argv[1:] or ["pallas"]
    v = None
    for backend in backends:
        for sr in (2, 0):
            model = FasterRCNN(
                layers=(3, 4, 6, 3), dtype=jnp.bfloat16,
                num_proposals=1000, roi_sampling_ratio=sr,
                roi_backend=backend,
            )
            if v is None:
                v = jax.jit(lambda r, xx: init_detector(model, r, xx))(
                    jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32)
                )

            @jax.jit
            def run(v, x, model=model):
                def step(carry, _):
                    xx = x + (carry * 1e-20).astype(x.dtype)
                    out = model.apply(v, xx, train=False)
                    boxes, scores, labels, valid = rcnn_detections(
                        out["proposals"], out["proposal_valid"],
                        out["cls"], out["reg"], img_shape=(H, W),
                    )
                    return jnp.sum(boxes[:, 0].astype(jnp.float32)) * 1e-20, None

                c, _ = jax.lax.scan(step, jnp.float32(0.0), None,
                                    length=ITERS)
                return c

            float(run(v, x))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(v, x))
                times.append(time.perf_counter() - t0)
            dt = min(times) / ITERS
            print(f"  {backend} sr={sr}: {dt*1e3:.1f} ms/iter = "
                  f"{B/dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
