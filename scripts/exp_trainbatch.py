#!/usr/bin/env python
"""Training-throughput batch scaling: the one lever the bs128 ledger never
moved.

The train step is bandwidth-bound at its byte floor (exp_traincost.py:
80.7 GB logical, 86.4 ms measured = 70.8 GB real at 819 GB/s).  Activation
bytes scale linearly with batch, but the per-step fixed costs (weight +
optimizer traffic, barriers, dispatch) do not — so img/s may still improve
past the reference's per-chip 128.  Measures full SGD steps (fwd + bwd +
BN stats + optimizer, changing state every iteration — honest by
construction) at bs 64/128/192/256; falls back to remat if a size OOMs.

Usage: python scripts/exp_trainbatch.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

ITERS = 30


def measure(batch: int, remat: bool = False) -> float:
    from mrla_tpu.models import create_model
    from mrla_tpu.train.losses import cross_entropy

    model = create_model("resnet50_mrlal", dtype=jnp.bfloat16, remat=remat)
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=True))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((batch, 224, 224, 3)),
            jnp.bfloat16,
        )
    )
    y = jnp.zeros((batch,), jnp.int32)

    @jax.jit
    def run_many(params, stats, opt_state, x, y):
        def body(carry, _):
            params, stats, opt_state, tick = carry
            xx = x + (tick * 1e-20).astype(x.dtype)

            def loss_fn(p, s):
                logits, nms = model.apply(
                    {"params": p, "batch_stats": s}, xx,
                    train=True, mutable=["batch_stats"],
                )
                return cross_entropy(logits, y), nms["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, stats, opt_state, loss), None

        carry, _ = jax.lax.scan(
            body, (params, stats, opt_state, jnp.float32(0.0)), None,
            length=ITERS,
        )
        return carry[3]

    float(run_many(params, stats, opt_state, x, y))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_many(params, stats, opt_state, x, y))
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS


def main() -> None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    for batch in (64, 128, 192, 256):
        try:
            dt = measure(batch)
            note = ""
        except Exception as e:  # XlaRuntimeError OOM at big batches
            if "RESOURCE_EXHAUSTED" not in str(e) and "Out of memory" not in str(e):
                raise
            dt = measure(batch, remat=True)
            note = " (remat: plain OOMed)"
        print(
            f"bs{batch}: {dt*1e3:6.1f} ms/step  {batch/dt:7.1f} img/s{note}",
            flush=True,
        )


if __name__ == "__main__":
    main()
