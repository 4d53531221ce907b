#!/usr/bin/env python
"""Experiment: MIXED microbatch-chain sizes along the depth axis.

Stage 1-2 activations are big ([16,56,56,256] = 9 MB/chain) — finer chains
might fit VMEM better there — while stage 3-4 convs have large C and may
prefer fatter chains for MXU utilization.  Re-chunking at a block boundary
costs one concat (one activation write+read, ~0.1 GB at the stage-2
boundary) against whatever the better chain size buys.

Usage: python scripts/exp_mixedsplit.py "8,16,7" "16,32,7" "16,16,0"
       (each arg = mb_early,mb_late,switch_block; switch 0 = uniform late)
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
ITERS = 200
LAYERS = (3, 4, 6, 3)


def main() -> None:
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params
    from mrla_tpu.serving.resnet_mrlal import _block, _stem

    combos = [tuple(int(v) for v in a.split(",")) for a in sys.argv[1:]] or [
        (8, 16, 7), (16, 32, 7)
    ]
    strides = []
    for stage_idx, blocks in enumerate(LAYERS):
        for block_idx in range(blocks):
            strides.append(2 if (stage_idx > 0 and block_idx == 0) else 1)
    n_blocks = sum(LAYERS)

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

    def forward(sp, x, mb_early, mb_late, switch):
        blocks = sp["blocks"]
        x = x.astype(sp["stem"]["k"].dtype)

        def head(chunk):
            y = _stem(chunk, sp["stem"])
            return run_blocks(y, blocks, 0, switch)

        def tail(y):
            y = run_blocks(y, blocks, switch, n_blocks)
            pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            fc = sp["fc"]
            return pooled @ fc["k"].astype(jnp.float32) + fc["b"]

        early = [
            head(x[i * mb_early:(i + 1) * mb_early])
            for i in range(BATCH // mb_early)
        ]
        g = mb_late // mb_early
        merged = [
            jnp.concatenate(early[j:j + g], axis=0) if g > 1 else early[j]
            for j in range(0, len(early), g)
        ]
        return jnp.concatenate([tail(m) for m in merged], axis=0)

    for mb_early, mb_late, switch in combos:
        @jax.jit
        def run_many(sp, x, a=mb_early, b=mb_late, s=switch):
            def body(carry, _):
                p = dict(sp)
                stem = dict(p["stem"])
                stem["b"] = stem["b"] + (carry * 1e-20).astype(stem["b"].dtype)
                p["stem"] = stem
                logits = forward(p, x, a, b, s)
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
        print(f"mixed mb={mb_early}->{mb_late}@{switch}: "
              f"{BATCH * ITERS / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
