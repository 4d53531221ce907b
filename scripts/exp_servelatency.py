#!/usr/bin/env python
"""Low-batch serving latency profile for resnet50_mrlal (production rows).

The throughput ledger pins bs128 (the north-star contract); a serving
deployment also cares about small-batch latency.  This measures ms/request
at bs 1/4/8/32/128 on the shipped engine with the honest input-perturbed
scan harness (block_until_ready is unreliable through the axon relay, so
per-call latency = scan time / iters; that UNDERSTATES true single-dispatch
latency by the host RTT, which is a property of this tunnel, not the
program).

Usage: python scripts/exp_servelatency.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 400


def main() -> None:
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        ),
    )
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params, resnet_mrlal_forward

    model = create_model("resnet50_mrlal")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    sp = prepare_inference_params(jax.device_get(variables), dtype=jnp.bfloat16)

    for batch in (1, 4, 8, 32, 128):
        x = jax.device_put(
            jnp.asarray(
                np.random.default_rng(0).standard_normal((batch, 224, 224, 3)),
                jnp.bfloat16,
            )
        )

        @jax.jit
        def run_many(sp, x):
            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = resnet_mrlal_forward(sp, xx)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        float(run_many(sp, x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_many(sp, x))
            times.append(time.perf_counter() - t0)
        dt = min(times) / ITERS
        print(
            f"bs{batch:>3}: {dt*1e3:6.3f} ms/call  {batch/dt:9.1f} img/s",
            flush=True,
        )


if __name__ == "__main__":
    main()
