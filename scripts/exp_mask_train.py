#!/usr/bin/env python
"""Mask R-CNN TRAIN step rows (round 5): the mask branch trains through
a SECOND differentiable RoIAlign (14x14 over the positive rois) plus the
FCN mask head + BCE — this measures the full step at the reference
contract (bs8 800x1344 bf16 SGD) for xla-sr2 (old default) vs
pallas-sr0 (new TPU default), completing the detection-training ledger
beside the faster_rcnn rows (exp_roialign_train.py).

Usage: exp_mask_train.py [backend:sr ...]
"""

from __future__ import annotations

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from mrla_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, H, W = 8, 800, 1344
G = 16
ITERS = 10


def make_batch(rng):
    x = rng.standard_normal((B, H, W, 3)).astype(np.float32)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_labels = np.zeros((B, G), np.int32)
    gt_valid = np.zeros((B, G), bool)
    gt_masks = np.zeros((B, G, H, W), bool)
    for b in range(B):
        n = int(rng.integers(3, 8))
        x1 = rng.uniform(0, W - 120, n)
        y1 = rng.uniform(0, H - 120, n)
        w = rng.uniform(40, 300, n)
        h = rng.uniform(40, 300, n)
        gt_boxes[b, :n] = np.stack(
            [x1, y1, np.minimum(x1 + w, W), np.minimum(y1 + h, H)], -1)
        gt_labels[b, :n] = rng.integers(0, 80, n)
        gt_valid[b, :n] = True
        for i in range(n):
            xx1, yy1, xx2, yy2 = gt_boxes[b, i].astype(int)
            gt_masks[b, i, yy1:yy2, xx1:xx2] = True
    return tuple(
        jnp.asarray(v)
        for v in (x, gt_boxes, gt_labels, gt_valid, gt_masks)
    )


def main():
    from mrla_tpu.detect.two_stage import MaskRCNN, init_detector
    from mrla_tpu.detect.two_stage_train import faster_rcnn_train_loss

    want = sys.argv[1:] or ["xla:2", "pallas:0"]
    rng = np.random.default_rng(0)
    batch = make_batch(rng)
    print(f"mask_rcnn train step, bs{B} {H}x{W} bf16 SGD, "
          f"input-perturbed x{ITERS}:", flush=True)

    for spec in want:
        backend, sr = spec.split(":")
        sr = int(sr)
        # remat: the mask branch's extra activations push the bs8
        # 800x1344 fwd+bwd ~43 MB past the 16 GB HBM (the reference
        # trains mask_rcnn at 2 imgs/GPU — bs8/chip is 4x its
        # per-device batch); backbone rematerialization trades the
        # measured ~11% (ROADMAP round-3 detect ledger) for fitting
        model = MaskRCNN(layers=(3, 4, 6, 3), dtype=jnp.bfloat16,
                         num_proposals=1000, roi_sampling_ratio=sr,
                         roi_backend=backend, remat=True)
        variables = jax.jit(lambda r, xx: init_detector(model, r, xx))(
            jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32)
        )
        params, bs = variables["params"], variables.get("batch_stats", {})
        tx = optax.sgd(0.02, momentum=0.9)
        opt_state = tx.init(params)

        def loss_fn(p, b, key):
            total, losses, _ = faster_rcnn_train_loss(
                model, {"params": p, "batch_stats": bs},
                b[0], b[1], b[2], b[3], key, train=False,
                gt_masks=b[4],
            )
            return total, losses

        # donate-chain instead of a lax.scan: the scan's carry in/out
        # doubles the param+momentum buffers, which is exactly the
        # ~150 MB that doesn't fit beside the bs8 mask-branch
        # activations.  p_{k+1} = f(p_k) still forces sequential device
        # execution; the input is perturbed per step via the carried
        # loss (honest-harness rule) and the final fetch bounds the
        # wall clock.
        @partial(jax.jit, donate_argnums=(0, 1))
        def step(p, o, prev, b):
            bb = (b[0] + (prev * jnp.float32(1e-20)).astype(b[0].dtype),
                  b[1], b[2], b[3], b[4])
            (total, _), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(p, bb, jax.random.key(0))
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, total

        def run(p, o, b):
            prev = jnp.float32(0.0)
            for _ in range(ITERS):
                p, o, prev = step(p, o, prev, b)
            return float(prev), p, o

        _, params, opt_state = run(params, opt_state, batch)
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            _, params, opt_state = run(params, opt_state, batch)
            times.append(time.perf_counter() - t0)
        dt = min(times) / ITERS
        print(f"  {backend} sr={sr}: {dt * 1e3:.1f} ms/step = "
              f"{B / dt:.1f} img/s", flush=True)
        del params, bs, opt_state


if __name__ == "__main__":
    main()
