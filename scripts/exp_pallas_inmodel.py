#!/usr/bin/env python
"""Megatail-v2 in-model verdict (VERDICT r2 next-1a): the shipped
microbatched resnet50_mrlal engine with use_pallas=True (chunked
kernels/mrla_megatail.py) vs the jnp default, on the real chip.

Usage: python scripts/exp_pallas_inmodel.py [mb ...]
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
ITERS = 100


def main():
    jax.config.update(
        "jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)

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

    # one row per (mb, pallas) pair given on argv as "mb:pallas"; defaults to
    # the two pallas rows.  jnp rows are already in the ROADMAP ledger.
    pairs = [
        (int(a.split(":")[0]), a.split(":")[1] in ("1", "True", "true"))
        for a in sys.argv[1:]
    ] or [(0, True), (16, True)]
    for mb, use_pallas in pairs:
        if True:
            @jax.jit
            def run_many(sp, x, mb=mb, use_pallas=use_pallas):
                def body(carry, _):
                    p = dict(sp)
                    stem = dict(p["stem"])
                    stem["b"] = stem["b"] + (carry * 1e-20).astype(
                        stem["b"].dtype
                    )
                    p["stem"] = stem
                    logits = resnet_mrlal_forward(
                        p, x, use_pallas=use_pallas, microbatch=mb
                    )
                    return jnp.sum(logits[:, 0]).astype(jnp.float32), None

                carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=ITERS)
                return carry

            t0 = time.perf_counter()
            float(run_many(sp, x))
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run_many(sp, x))
                times.append(time.perf_counter() - t0)
            dt = min(times)
            print(
                f"mrlal mb={mb} pallas={use_pallas}: "
                f"{BATCH * ITERS / dt:.1f} img/s "
                f"({dt / ITERS * 1e3:.2f} ms/iter, compile {compile_s:.0f}s)",
                flush=True,
            )


if __name__ == "__main__":
    main()
