#!/usr/bin/env python
"""Decompose the faster_rcnn e2e 42 img/s (bs8 COCO size): which stage
owns the time — trunk+FPN+RPN-head, RPN decode/NMS, RoIAlign+bbox head,
or the second-stage decode?  Each row times a prefix of the pipeline in
ONE jitted input-perturbed scan (honest harness)."""

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


def timeit(fn, *args):
    float(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS


def main():
    from mrla_tpu.detect.two_stage import (
        FasterRCNN, init_detector, rcnn_detections, rpn_proposals,
    )
    from mrla_tpu.detect.roi_align import batched_roi_align

    model = FasterRCNN(layers=(3, 4, 6, 3), dtype=jnp.bfloat16,
                       num_proposals=1000)
    v = jax.jit(lambda r, x: init_detector(model, r, x))(
        jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((B, H, W, 3)),
            jnp.bfloat16,
        )
    )

    def scan(body):
        @jax.jit
        def run(v, x):
            def step(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                return body(v, xx), None

            c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=ITERS)
            return c

        return run

    # 1. trunk + FPN + RPN head only
    def trunk_rpn(v, xx):
        feats, rpn_outs = model.apply(
            v, xx, False, method=FasterRCNN.rpn_forward
        )
        return sum(
            jnp.sum(c[:, 0, 0].astype(jnp.float32)) for c, _ in rpn_outs
        ) + sum(jnp.sum(f[:, 0, 0, 0].astype(jnp.float32)) for f in feats)

    t1 = timeit(scan(trunk_rpn), v, x)
    print(f"trunk+FPN+RPN-head: {t1*1e3:.1f} ms/iter ({B/t1:.1f} img/s)",
          flush=True)

    # 2. + RPN decode/NMS (1000 proposals)
    def plus_proposals(v, xx):
        feats, rpn_outs = model.apply(
            v, xx, False, method=FasterRCNN.rpn_forward
        )
        props, scores, valid = rpn_proposals(
            rpn_outs, (H, W), max_per_img=1000
        )
        return jnp.sum(props[:, 0].astype(jnp.float32)) + jnp.sum(
            scores[:, 0]
        )

    t2 = timeit(scan(plus_proposals), v, x)
    print(f"+ RPN decode/NMS: {t2*1e3:.1f} ms/iter "
          f"(NMS stage = {(t2-t1)*1e3:.1f} ms)", flush=True)

    # 3. + RoIAlign (1000 rois) + bbox head
    def plus_roi(v, xx):
        out = model.apply(v, xx, train=False)
        return jnp.sum(out["cls"][:, 0].astype(jnp.float32))

    t3 = timeit(scan(plus_roi), v, x)
    print(f"+ RoIAlign+bbox head: {t3*1e3:.1f} ms/iter "
          f"(RoI stage = {(t3-t2)*1e3:.1f} ms)", flush=True)

    # 4. + second-stage decode (the full e2e)
    def full(v, xx):
        out = model.apply(v, xx, train=False)
        boxes, scores, labels, valid = rcnn_detections(
            out["proposals"], out["proposal_valid"], out["cls"],
            out["reg"], img_shape=(H, W),
        )
        return jnp.sum(boxes[:, 0].astype(jnp.float32)) + jnp.sum(
            scores[:, 0]
        )

    t4 = timeit(scan(full), v, x)
    print(f"+ rcnn decode/NMS: {t4*1e3:.1f} ms/iter "
          f"(decode stage = {(t4-t3)*1e3:.1f} ms) -> {B/t4:.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
