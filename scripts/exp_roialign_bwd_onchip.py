#!/usr/bin/env python
"""On-chip element-level backward parity for the patch-DMA RoIAlign VJP.

The CPU interpret-mode tests prove the backward math; this proves the
COMPILED Mosaic kernel (RMW-DMA scatter, alignment, semaphores) on real
hardware: fp32 features, jax.grad through roi_align_patch vs through
batched_roi_align, per-level max |Δ| at COCO-like shapes, sr in {2, 0}.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from mrla_tpu.detect.roi_align import batched_roi_align
from mrla_tpu.kernels.roialign_patch import roi_align_patch


def main():
    rng = np.random.default_rng(0)
    B, P, C = 2, 256, 256
    sizes = [(200, 336), (100, 168), (50, 84), (25, 42)]
    feats = [
        jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.float32)
        for h, w in sizes
    ]
    scale = np.exp(rng.uniform(np.log(8.0), np.log(700.0), (B, P)))
    ar = np.exp(rng.uniform(np.log(1 / 3), np.log(3.0), (B, P)))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(0, 1344, (B, P))
    cy = rng.uniform(0, 800, (B, P))
    rois = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    rois = jnp.asarray(
        np.clip(rois, [0, 0, 0, 0], [1344, 800, 1344, 800]), jnp.float32)
    valid = jnp.asarray(rng.random((B, P)) > 0.1)
    ct = jnp.asarray(rng.standard_normal((B, P, 7, 7, C)), jnp.float32)

    for sr in (2, 0):
        def loss_p(fs):
            return jnp.sum(
                roi_align_patch(fs, rois, valid, sampling_ratio=sr) * ct)

        def loss_x(fs):
            return jnp.sum(
                batched_roi_align(fs, rois, valid, sampling_ratio=sr) * ct)

        with jax.default_matmul_precision("float32"):
            fp = float(jax.jit(loss_p)(feats))
            fx = float(jax.jit(loss_x)(feats))
            gp = jax.jit(jax.grad(loss_p))(feats)
            gx = jax.jit(jax.grad(loss_x))(feats)
        print(f"sr={sr}: fwd loss pallas {fp:.4f} xla {fx:.4f} "
              f"(rel {abs(fp - fx) / (abs(fx) + 1e-9):.2e})", flush=True)
        for lvl, (a, b) in enumerate(zip(gp, gx)):
            s = float(jnp.max(jnp.abs(b))) + 1e-9
            d = float(jnp.max(jnp.abs(a - b)))
            print(f"  lvl{lvl}: grad max|Δ| {d:.3e} (ref max {s:.3e}, "
                  f"rel {d / s:.2e})", flush=True)


if __name__ == "__main__":
    main()
