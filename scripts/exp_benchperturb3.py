#!/usr/bin/env python
"""Honest-harness config re-optimization for the mrlal serving engine.

exp_benchperturb2.py (input-perturbed, bs128 bf16) showed the old defaults
were tuned under the hoisting harness: s2d stem LOSES 7% (repack was being
hoisted), and mb32 beats mb16 (8 per-chain stems cost more than 4).  This
fills in the matrix {s2d, no-s2d} x {mb16, 32, 64, 0} plus SHARED-stem
forms (stem+maxpool on the full batch — best MXU utilization, no per-chain
stem overhead — then chains split after).

Usage: python scripts/exp_benchperturb3.py
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
    from mrla_tpu.serving import prepare_inference_params, resnet_mrlal_forward
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
    sp_nos2d = dict(sp)
    sp_nos2d["stem"] = {k: v for k, v in sp["stem"].items() if k != "k_s2d"}
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
            jnp.bfloat16,
        )
    )

    def run_engine(mb):
        @jax.jit
        def run(sp, x):
            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = resnet_mrlal_forward(sp, xx, microbatch=mb)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        return run

    def shared_stem_forward(sp, x, mb):
        blocks = sp["blocks"]
        x = x.astype(sp["stem"]["k"].dtype)
        y = _stem(x, sp["stem"])

        def tail(y):
            for i in range(len(blocks)):
                p = blocks[i]
                heads = p["lam"].shape[0] // 32
                y, _ = _block(y, p, strides[i], heads, False)
            pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
            fc = sp["fc"]
            return pooled @ fc["k"].astype(jnp.float32) + fc["b"]

        return jnp.concatenate(
            [tail(y[j * mb : (j + 1) * mb]) for j in range(BATCH // mb)]
        )

    def run_shared(mb):
        @jax.jit
        def run(sp, x):
            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = shared_stem_forward(sp, xx, mb)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        return run

    rows = [
        ("no-s2d mb32", run_engine(32), sp_nos2d),
        ("no-s2d mb64", run_engine(64), sp_nos2d),
        ("s2d mb64", run_engine(64), sp),
        ("no-s2d mb0", run_engine(0), sp_nos2d),
        ("shared-stem no-s2d mb16", run_shared(16), sp_nos2d),
        ("shared-stem no-s2d mb32", run_shared(32), sp_nos2d),
        ("shared-stem s2d mb16", run_shared(16), sp),
    ]
    for name, fn, p in rows:
        dt = timeit(fn, p, x)
        print(f"{name}: {BATCH * ITERS / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
