#!/usr/bin/env python
"""Pallas RoIAlign in-model, t3-prefix form: trunk+FPN+RPN decode+
RoIAlign+bbox head (no rcnn decode — its 1.5 ms is backend-independent,
exp_detect_e2e_decomp.py).  Smaller program than the full e2e scan,
sidestepping the pathological compile of detector+NMS+Pallas+decode in
one XLA program.  Usage: exp_roialign_e2e2.py [xla|pallas] [sr] [iters]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, H, W = 8, 800, 1344


def main():
    from mrla_tpu.detect.two_stage import FasterRCNN, init_detector

    backend = sys.argv[1] if len(sys.argv) > 1 else "pallas"
    sr = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 10

    model = FasterRCNN(
        layers=(3, 4, 6, 3), dtype=jnp.bfloat16, num_proposals=1000,
        roi_sampling_ratio=sr, roi_backend=backend,
    )
    v = jax.jit(lambda r, xx: init_detector(model, r, xx))(
        jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((B, H, W, 3)),
            jnp.bfloat16,
        )
    )

    @jax.jit
    def run(v, x):
        def step(carry, _):
            xx = x + (carry * 1e-20).astype(x.dtype)
            out = model.apply(v, xx, train=False)
            return jnp.sum(out["cls"][:, 0].astype(jnp.float32)) * 1e-20, None

        c, _ = jax.lax.scan(step, jnp.float32(0.0), None, length=iters)
        return c

    print(f"compiling {backend} sr={sr}...", flush=True)
    t0 = time.perf_counter()
    float(run(v, x))
    print(f"  compile+first: {time.perf_counter()-t0:.0f} s", flush=True)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(v, x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / iters
    print(f"  {backend} sr={sr} t3-prefix: {dt*1e3:.1f} ms/iter = "
          f"{B/dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
