#!/usr/bin/env python
"""Low-batch latency: int8 engine vs bf16 (the regime where int8 should
actually win).

At bs128 the int8 engine's safe form only ties (+0.7%) because traffic is
activation-dominated.  At bs1-8 the program is WEIGHT-read-bound (~51 MB
bf16 of conv kernels vs ~25.5 MB int8), so halving weight bytes should
cut latency toward 2x — the genuine deployment case for --quant int8
(interactive serving).

Usage: python scripts/exp_quant_latency.py
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
    from mrla_tpu.serving.quant import (
        prepare_quant_params,
        resnet_mrlal_quant_forward,
    )

    rng = np.random.default_rng(0)
    model = create_model("resnet50_mrlal")
    variables = jax.device_get(
        jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
        )
    )
    sp = prepare_inference_params(variables, dtype=jnp.bfloat16)
    calib = jnp.asarray(rng.standard_normal((32, 224, 224, 3)), jnp.float32)
    qp = prepare_quant_params(variables, calib)

    def scan_fwd(fwd):
        @jax.jit
        def run(p, x):
            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = fwd(p, xx)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=ITERS)
            return carry

        return run

    rows = [
        ("bf16", sp, lambda p, x: resnet_mrlal_forward(p, x)),
        ("int8-safe", qp,
         lambda p, x: resnet_mrlal_quant_forward(p, x, quant_residual=False)),
        ("int8-fast", qp,
         lambda p, x: resnet_mrlal_quant_forward(p, x, quant_residual=True)),
    ]
    for bs in (1, 4, 8, 32):
        x = jax.device_put(jnp.asarray(
            rng.standard_normal((bs, 224, 224, 3)), jnp.bfloat16
        ))
        out = []
        for name, p, fwd in rows:
            dt = timeit(scan_fwd(fwd), p, x) / ITERS
            out.append(f"{name} {dt * 1e3:.3f} ms ({bs / dt:.0f} img/s)")
        print(f"bs{bs}: " + "  ".join(out), flush=True)


if __name__ == "__main__":
    main()
