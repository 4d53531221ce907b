#!/usr/bin/env python
"""Headline benchmark: resnet50_mrlal ImageNet-size inference throughput on
one TPU chip (north star in BASELINE.json: >= 8000 img/s/chip @ batch 128,
v5e, bf16).

Prints exactly ONE JSON line:
  {"metric": ..., "value": N, "unit": "img/s/chip", "vs_baseline": N/8000}

Methodology: runs the serving engine (mrla_tpu.serving — BN-folded params,
bf16, logits verified against the Flax model).  The timed region executes
ITERS forwards fully on-device inside one jitted lax.scan; a carried scalar
perturbs the INPUT each step so every iteration processes fresh data — as
real serving does — and NOTHING is loop-invariant; the carry is fetched at
the end — one dispatch, one host round-trip, so the remote-tunnel dispatch
latency of this environment cannot pollute the number (block_until_ready
is unreliable through the relay).

The perturbation point matters: earlier rounds perturbed a stem BIAS,
which left the stem conv on the constant input loop-invariant — XLA
hoisted it (plus the then-default space-to-depth repack) out of the scan,
inflating throughput ~27% (11.5k vs 8.45k img/s on the same engine;
quantified in scripts/exp_benchperturb.py, decomposed in
exp_benchperturb2.py).  The engine defaults were then re-tuned under the
honest harness (exp_benchperturb3/4.py): shared-stem chains, mb32, no s2d.

ITERS=400: the dispatch+fetch round trip costs ~30 ms regardless of work
(measured with a trivial scan body); at 50 iterations that inflated the
per-iteration time by ~0.6 ms (-3.5% throughput).  400 iterations push the
fixed cost below 0.1 ms/iter while keeping the run under a minute."""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BATCH = 128
ITERS = 400
BASELINE_IMG_PER_S = 8000.0


def main() -> None:
    # The microbatched serving program takes minutes to compile; persist the
    # compiled executable so repeat runs (and CI/driver invocations after a
    # warmup) skip straight to measurement.  Inside main() so importing this
    # module has no process-wide side effects (ADVICE r2).  Same helper the
    # daemons use (round 5); the repo-local dir is kept so driver runs stay
    # warm across rounds.
    from mrla_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache(
        os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
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

    @jax.jit
    def run_many(sp, x):
        def body(carry, _):
            # perturb the INPUT: every op in the network is then
            # iteration-dependent (honest harness — see module docstring)
            xx = x + (carry * 1e-20).astype(x.dtype)
            logits = resnet_mrlal_forward(sp, xx, use_pallas=False)
            # consume every SAMPLE's output (not just logits[0]): the engine
            # traces independent microbatch chains, and XLA dead-code
            # eliminates any chain whose outputs the carry doesn't touch
            return jnp.sum(logits[:, 0]).astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    float(run_many(sp, x))  # compile + warmup (fetch guarantees completion)

    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_many(sp, x))
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
