#!/usr/bin/env python
"""Sweep TPU compiler options on the headline serving benchmark.

Same methodology as bench.py (one dispatched lax.scan of ITERS forwards,
carry fetch guarantees completion), but compiles run_many via
.lower().compile(compiler_options=...) so each variant hits the remote TPU
compiler with different knobs.

Usage: python scripts/bench_sweep.py '{"xla_tpu_scoped_vmem_limit_kib": "65536"}' ...
       (each positional arg is a JSON dict of compiler options; {} = default)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
ITERS = 200


def main() -> None:
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params, resnet_mrlal_forward

    variants = [json.loads(a) for a in sys.argv[1:]] or [{}]

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

    def run_many(sp, x):
        def body(carry, _):
            p = dict(sp)
            stem = dict(p["stem"])
            stem["b"] = stem["b"] + (carry * 1e-20).astype(stem["b"].dtype)
            p["stem"] = stem
            logits = resnet_mrlal_forward(p, x, use_pallas=False)
            # consume every sample so no microbatch chain is DCE'd
            return jnp.sum(logits[:, 0]).astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    lowered = jax.jit(run_many).lower(sp, x)
    for opts in variants:
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:
            print(json.dumps({"opts": opts, "error": str(e)[:160]}), flush=True)
            continue
        float(compiled(sp, x))  # warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(sp, x))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(
            json.dumps(
                {"opts": opts, "img_per_s": round(BATCH * ITERS / dt, 1)}
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
