#!/usr/bin/env python
"""Does the headline bench's carry-perturbation point hide hoisted work?

bench.py threads the scan carry through the STEM BIAS: the stem conv on the
constant input is then loop-invariant and XLA may compute it once outside
the scan, slightly inflating img/s.  Perturbing the INPUT instead makes
every op iteration-dependent.  This measures both on the same harness
(bs128 bf16 mb16, ITERS=400) to quantify the gap and decide what bench.py
should ship.

Usage: python scripts/exp_benchperturb.py
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


def main() -> None:
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

    @jax.jit
    def run_stem_bias(sp, x):
        def body(carry, _):
            p = dict(sp)
            stem = dict(p["stem"])
            stem["b"] = stem["b"] + (carry * 1e-20).astype(stem["b"].dtype)
            p["stem"] = stem
            logits = resnet_mrlal_forward(p, x)
            return jnp.sum(logits[:, 0]).astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    @jax.jit
    def run_input(sp, x):
        def body(carry, _):
            xx = x + (carry * 1e-20).astype(x.dtype)
            logits = resnet_mrlal_forward(sp, xx)
            return jnp.sum(logits[:, 0]).astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    for name, fn in (("stem-bias", run_stem_bias), ("input", run_input)):
        float(fn(sp, x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(fn(sp, x))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"perturb={name}: {BATCH * ITERS / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
