#!/usr/bin/env python
"""Stage-resident stage-4 Pallas kernel: on-chip parity + IN-MODEL verdict.

VERDICT round-3 item 3: per-block epilogue kernels die at their HBM
boundaries, but a kernel holding all three stage-4 blocks VMEM-resident
(kernels/mrla_stage4.py) is the one fusion class never measured.  This
runs (a) on-chip logit parity vs the jnp serving chain, (b) the honest
input-perturbed bs128 serving bench with use_stage4 on/off, unsplit and
with the shipped mb32 shared-stem chains.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

from mrla_tpu.models import create_model
from mrla_tpu.serving.resnet_mrlal import (
    attach_stage4, prepare_inference_params, resnet_mrlal_forward)

BS = 128
ITERS = 30


def bench(name, f, x):
    """Honest harness: input perturbed INSIDE the timed scan."""

    @jax.jit
    def run(x):
        def body(carry, _):
            out = f(x + carry * 1e-20)
            return jnp.sum(out[:, 0].astype(jnp.float32)) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    float(run(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    rate = BS / dt
    print(f"  {name}: {dt*1e3:.2f} ms/call = {rate:,.0f} img/s", flush=True)
    return rate


def main():
    model = create_model("resnet50_mrlal")
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, jnp.zeros((1, 224, 224, 3)), train=False)
    sp = prepare_inference_params(variables)
    attach_stage4(sp)

    x = jax.random.normal(jax.random.PRNGKey(1), (BS, 224, 224, 3),
                          jnp.bfloat16)

    # on-chip parity (bf16 serving dtype; kernel reassociates the matmuls)
    print("compiling jnp unsplit forward...", flush=True)
    ref = resnet_mrlal_forward(sp, x, microbatch=0)
    ref.block_until_ready()
    print("compiling stage4 unsplit forward...", flush=True)
    got = resnet_mrlal_forward(sp, x, microbatch=0, use_stage4=True)
    rel = float(jnp.max(jnp.abs(ref - got))) / float(jnp.max(jnp.abs(ref)))
    print(f"on-chip logit parity (bf16): rel {rel:.2e}", flush=True)
    assert rel < 5e-2, rel

    print(f"in-model serving, bs{BS} bf16 224px, input-perturbed scan:",
          flush=True)
    bench("jnp unsplit          ",
          lambda x: resnet_mrlal_forward(sp, x, microbatch=0), x)
    bench("stage4 unsplit       ",
          lambda x: resnet_mrlal_forward(sp, x, microbatch=0,
                                         use_stage4=True), x)
    bench("jnp mb32 shared-stem (shipped default)",
          lambda x: resnet_mrlal_forward(sp, x), x)
    bench("stage4 mb32 shared-stem",
          lambda x: resnet_mrlal_forward(sp, x, use_stage4=True), x)
    bench("stage4 mb16 shared-stem",
          lambda x: resnet_mrlal_forward(sp, x, microbatch=16,
                                         use_stage4=True), x)


if __name__ == "__main__":
    main()
