#!/usr/bin/env python
"""Headline benchmark: resnet50_mrlal ImageNet-size inference throughput on
one TPU chip (north star in BASELINE.json: >= 8000 img/s/chip @ batch 128,
v5e, bf16).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/8000}

Methodology: the timed region runs ITERS forwards fully on-device inside one
jitted lax.scan (inputs resident, a scalar reduction carried through each
step so no iteration can be elided), then fetches the carried scalar — one
dispatch, one host round-trip, so the remote-tunnel dispatch latency of this
environment does not pollute the steady-state number.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
ITERS = 50
BASELINE_IMG_PER_S = 8000.0


def main() -> None:
    from mrla_tpu.models import create_model

    model = create_model("resnet50_mrlal", dtype=jnp.bfloat16)
    rng = jax.random.key(0)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        rng, jnp.zeros((1, 224, 224, 3), jnp.bfloat16)
    )
    x_host = np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3))
    x = jax.device_put(jnp.asarray(x_host, dtype=jnp.bfloat16))

    @jax.jit
    def run_many(v, x):
        def body(carry, _):
            logits = model.apply(v, x + carry * 1e-6, train=False)
            return jnp.sum(logits[0]).astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    # compile + warmup (result fetched to guarantee completion)
    float(run_many(variables, x))

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_many(variables, x))
        times.append(time.perf_counter() - t0)
    dt = min(times)

    img_per_s = BATCH * ITERS / dt
    print(
        json.dumps(
            {
                "metric": "resnet50_mrlal ImageNet-1K inference throughput (224px, bf16, bs128)",
                "value": round(img_per_s, 1),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_s / BASELINE_IMG_PER_S, 4),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
