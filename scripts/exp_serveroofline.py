#!/usr/bin/env python
"""Roofline the SHIPPED honest serving program (shared-stem mb32, no-s2d).

The round-2 roofline ran on the old full-split mb16 program under the
hoisting harness; the shipped engine and the harness both changed.  This
computes the XLA cost-model bytes/flops for the exact program bench.py
times (including the input-perturbation add) and compares to the measured
10.8k img/s to decide whether further serving tuning has headroom.

Usage: python scripts/exp_serveroofline.py
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
HBM_GBPS = 819.0
PEAK_TFLOPS = 197.0  # v5e bf16


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
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
            jnp.bfloat16,
        )
    )

    # single-call program (what one serving step executes)
    fwd = jax.jit(lambda sp, x: resnet_mrlal_forward(sp, x))
    ca = fwd.lower(sp, x).compile().cost_analysis()
    by, fl = ca.get("bytes accessed", 0.0), ca.get("flops", 0.0)
    bw_ms = by / 1e9 / HBM_GBPS * 1e3
    fl_ms = fl / 1e12 / PEAK_TFLOPS * 1e3
    print(
        f"single-call: cost-model {by/1e9:.2f} GB -> bw-roofline {bw_ms:.2f} ms"
        f" ({BATCH/bw_ms*1e3:.0f} img/s); {fl/1e12:.3f} TF -> mxu-roofline"
        f" {fl_ms:.2f} ms ({BATCH/fl_ms*1e3:.0f} img/s)",
        flush=True,
    )

    # the timed scan program, honest input perturbation (bench.py harness)
    @jax.jit
    def run_many(sp, x):
        def body(carry, _):
            xx = x + (carry * 1e-20).astype(x.dtype)
            logits = resnet_mrlal_forward(sp, xx)
            return jnp.sum(logits[:, 0]).astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    compiled = run_many.lower(sp, x).compile()
    ca = compiled.cost_analysis()
    by = ca.get("bytes accessed", 0.0) / ITERS
    print(f"scan program: cost-model {by/1e9:.2f} GB/iter", flush=True)

    float(run_many(sp, x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_many(sp, x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    print(
        f"measured: {dt*1e3:.2f} ms/iter = {BATCH/dt:.1f} img/s;"
        f" implied traffic {dt*HBM_GBPS:.1f} GB/iter;"
        f" % of single-call bw-roofline: {bw_ms/1e3/dt*100:.0f}%",
        flush=True,
    )


if __name__ == "__main__":
    main()
