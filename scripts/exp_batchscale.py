#!/usr/bin/env python
"""Does the microbatch-chain serving engine scale past the bs128 contract?

The north star (BASELINE.json) is bs128, but nothing pins serving to it:
with 32-image chains the program is 4 chains at bs128 and 8 at bs256 —
more chains = more overlap opportunity for XLA's scheduler, at the price
of more per-chain weight re-reads.  This measures resnet50_mrlal at
bs128/256/512 (mb32 engine defaults, plus mb64 at bs256 as a chain-size
control), honest input-perturbed scan harness as bench.py.

Usage: python scripts/exp_batchscale.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

ITERS = 200


def main() -> None:
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params, resnet_mrlal_forward

    model = create_model("resnet50_mrlal")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    sp = prepare_inference_params(jax.device_get(variables), dtype=jnp.bfloat16)

    for batch, mb in ((128, 32), (256, 32), (512, 32), (256, 64)):
        x = jax.device_put(
            jnp.asarray(
                np.random.default_rng(0).standard_normal((batch, 224, 224, 3)),
                jnp.bfloat16,
            )
        )

        @jax.jit
        def run_many(sp, x, mb=mb):
            def body(carry, _):
                # input perturbation — honest harness (exp_benchperturb.py)
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = resnet_mrlal_forward(sp, xx, microbatch=mb)
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
        print(f"bs{batch} mb{mb}: {batch * ITERS / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
