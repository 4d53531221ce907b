#!/usr/bin/env python
"""Refine the honest-harness winner: shared-prefix depth x chain size.

exp_benchperturb3.py: shared-stem no-s2d mb32 = 10,778 img/s (vs 9,765
full-split mb32, 8,450 old default).  This sweeps how much of the network
prefix runs at full batch before splitting (depth = #blocks after the stem)
and the chain size, all input-perturbed, no-s2d, bs128 bf16.

Usage: python scripts/exp_benchperturb4.py
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
ITERS = 400


def timeit(fn, *args):
    float(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params
    from mrla_tpu.serving.resnet_mrlal import _block, _stem

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

    def forward(sp, x, depth, mb):
        blocks = sp["blocks"]
        n_blocks = len(blocks)

        def run_blocks(y, i0, i1):
            for i in range(i0, i1):
                p = blocks[i]
                heads = p["lam"].shape[0] // 32
                y, _ = _block(y, p, strides[i], heads, False)
            return y

        def tail(y, i0):
            y = run_blocks(y, i0, n_blocks)
            pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            fc = sp["fc"]
            return pooled @ fc["k"].astype(jnp.float32) + fc["b"]

        x = x.astype(sp["stem"]["k"].dtype)
        y = _stem(x, sp["stem"])
        y = run_blocks(y, 0, depth)
        return jnp.concatenate(
            [tail(y[j * mb : (j + 1) * mb], depth) for j in range(BATCH // mb)]
        )

    for depth, mb in ((0, 32), (1, 32), (3, 32), (7, 32), (0, 64), (3, 16)):
        @jax.jit
        def run(sp, x, depth=depth, mb=mb):
            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = forward(sp, xx, depth, mb)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        dt = timeit(run, sp, x)
        print(f"shared depth={depth} mb={mb}: {BATCH * ITERS / dt:.1f} img/s",
              flush=True)


if __name__ == "__main__":
    main()
