#!/usr/bin/env python
"""Experiment: where to START the microbatch chains.

The stem (7x7 conv + maxpool) has no MRLA barrier, so it could run on the
full batch (best MXU utilization) with chains starting afterwards — or the
split could even be deferred past stage 1.  Measures img/s for split depth
d = number of leading BLOCKS (after the stem for d>=0; d=-1 means split
before the stem, i.e. the shipped engine) run on the full batch before
splitting into 16-image chains.

Usage: python scripts/exp_splitpoint.py [-1 0 3 7]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
MB = 16
ITERS = 200


def main() -> None:
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params
    from mrla_tpu.serving.resnet_mrlal import _block, _stem

    depths = [int(a) for a in sys.argv[1:]] or [-1, 0, 3]
    layers = (3, 4, 6, 3)
    strides = []
    for stage_idx, blocks in enumerate(layers):
        for block_idx in range(blocks):
            strides.append(2 if (stage_idx > 0 and block_idx == 0) else 1)

    model = create_model("resnet50_mrlal")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    sp = prepare_inference_params(jax.device_get(variables), dtype=jnp.bfloat16)
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
            jnp.bfloat16,
        )
    )

    def run_blocks(y, blocks, i0, i1, dim_perhead=32):
        for i in range(i0, i1):
            p = blocks[i]
            heads = p["lam"].shape[0] // dim_perhead
            y, _ = _block(y, p, strides[i], heads, False,
                          x1_pre=None, p_next=None)
        return y

    def forward(sp, x, depth):
        blocks = sp["blocks"]
        n_blocks = len(blocks)
        x = x.astype(sp["stem"]["k"].dtype)

        def tail(y, i0):
            y = run_blocks(y, blocks, i0, n_blocks)
            pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            fc = sp["fc"]
            return pooled @ fc["k"].astype(jnp.float32) + fc["b"]

        if depth < 0:
            return jnp.concatenate([
                tail(_stem(x[j * MB:(j + 1) * MB], sp["stem"]), 0)
                for j in range(BATCH // MB)
            ])
        y = _stem(x, sp["stem"])
        y = run_blocks(y, blocks, 0, depth)
        return jnp.concatenate([
            tail(y[j * MB:(j + 1) * MB], depth)
            for j in range(BATCH // MB)
        ])

    for depth in depths:
        @jax.jit
        def run_many(sp, x, depth=depth):
            def body(carry, _):
                # input perturbation — honest harness (exp_benchperturb.py):
                # stem-bias perturbation let XLA hoist the constant-input
                # stem prefix out of the scan, muting exactly the cost this
                # experiment varies (where the stem runs)
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = forward(sp, xx, depth)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        float(run_many(sp, x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_many(sp, x))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"splitpoint depth={depth}: {BATCH * ITERS / dt:.1f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
