#!/usr/bin/env python
"""Exact-greedy blocked NMS vs the shipped argmax-loop NMS.

Shipped nms_fixed: max_out sequential iterations of argmax-over-N +
row-suppression — cost scales with max_out (16.7 ms for the RPN's
1000-pick case at bs8, exp_detect_e2e_decomp.py).

Blocked variant: candidates sorted by score once; greedy decided in
score order with K-sized blocks — inner fori touches only [K] lanes,
and cross-block suppression propagates as ONE [K, N] reduce per block.
Cost scales with N (inner steps) instead of max_out, so it can only win
when max_out is a large fraction of N (RPN: 1000 of 5000; NOT the
100-of-1000 detection case).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.detect.bbox import bbox_overlaps, nms_fixed

B, N, MAX_OUT, K = 8, 5000, 1000, 256
ITERS = 5


def nms_fixed_blocked(boxes, scores, iou_threshold, max_out, block=K):
    n = boxes.shape[0]
    order = jnp.argsort(-scores)
    b_sorted = boxes[order]
    s_sorted = scores[order]
    n_blocks = (n + block - 1) // block
    pad = n_blocks * block - n
    alive0 = jnp.pad(s_sorted > 0.0, (0, pad))
    b_padded = jnp.pad(b_sorted, ((0, pad), (0, 0)))

    def outer(b, state):
        sup, kept = state  # [Np] suppressed-by-kept, [Np] kept
        start = b * block
        # block-vs-all IoU computed HERE: never materializes [N, N]
        blk_boxes = jax.lax.dynamic_slice(
            b_padded, (start, 0), (block, 4)
        )
        blk = bbox_overlaps(blk_boxes, b_padded)  # [K, Np]
        blk_local = jax.lax.dynamic_slice(
            blk, (0, start), (block, block)
        )  # [K, K]
        sup_in = jax.lax.dynamic_slice(sup, (start,), (block,))
        alive_in = jax.lax.dynamic_slice(alive0, (start,), (block,))

        def inner(i, st):
            sup_loc, kept_loc = st
            k = alive_in[i] & ~(sup_in[i] | sup_loc[i])
            kept_loc = kept_loc.at[i].set(k)
            sup_loc = sup_loc | (k & (blk_local[i] > iou_threshold))
            return sup_loc, kept_loc

        sup_loc, kept_loc = jax.lax.fori_loop(
            0, block, inner,
            (jnp.zeros(block, bool), jnp.zeros(block, bool)),
        )
        # propagate this block's kept picks to everyone after
        sup_new = sup | jnp.any(
            kept_loc[:, None] & (blk > iou_threshold), axis=0
        )
        kept = jax.lax.dynamic_update_slice(kept, kept_loc, (start,))
        return sup_new, kept

    _, kept = jax.lax.fori_loop(
        0, n_blocks, outer,
        (jnp.zeros(n_blocks * block, bool),
         jnp.zeros(n_blocks * block, bool)),
    )
    kept = kept[:n]
    # first max_out kept (in score order) -> original indices + validity
    rank_key = jnp.where(kept, jnp.arange(n), n + jnp.arange(n))
    take = jnp.argsort(rank_key)[:max_out]
    valid = kept[take]
    idxs = jnp.where(valid, order[take], -1).astype(jnp.int32)
    return idxs, valid


def main():
    rng = np.random.default_rng(0)
    xy = rng.uniform(0, 700, (B, N, 2))
    wh = rng.uniform(20, 400, (B, N, 2))
    boxes = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    scores = jnp.asarray(rng.uniform(0.01, 1, (B, N)), jnp.float32)

    # correctness vs shipped (per image)
    i0, v0 = jax.vmap(
        lambda b, s: nms_fixed(b, s, 0.7, MAX_OUT)
    )(boxes, scores)
    i1, v1 = jax.vmap(
        lambda b, s: nms_fixed_blocked(b, s, 0.7, MAX_OUT)
    )(boxes, scores)
    same_valid = bool(jnp.all(v0 == v1))
    same_idx = bool(jnp.all(jnp.where(v0, i0, -1) == jnp.where(v1, i1, -1)))
    print(f"exactness: valid {same_valid}, idxs {same_idx}", flush=True)

    for name, fn in [("shipped", nms_fixed), ("blocked", nms_fixed_blocked)]:
        @jax.jit
        def run(boxes, scores, fn=fn):
            def body(c, _):
                ss = scores + c * 1e-20
                idxs, valid = jax.vmap(
                    lambda b, s: fn(b, s, 0.7, MAX_OUT)
                )(boxes, ss)
                return jnp.sum(idxs * valid).astype(jnp.float32), None

            c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return c

        float(run(boxes, scores))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run(boxes, scores))
            ts.append(time.perf_counter() - t0)
        print(f"{name}: {min(ts)/ITERS*1e3:.2f} ms/iter (bs{B}, N={N}, "
              f"max_out={MAX_OUT})", flush=True)


if __name__ == "__main__":
    main()
