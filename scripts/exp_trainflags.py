#!/usr/bin/env python
"""Sweep TPU compiler options on the TRAINING step (the serving sweep
showed defaults win there; training has different pressure — bigger live
ranges, backward fusions).

Usage: python scripts/exp_trainflags.py '{}' '{"xla_tpu_scoped_vmem_limit_kib":"32768"}'
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
import optax

BATCH = 128
ITERS = 30


def main() -> None:
    from mrla_tpu.models import create_model
    from mrla_tpu.train.losses import cross_entropy

    variants = [json.loads(a) for a in sys.argv[1:]] or [{}]

    model = create_model("resnet50_mrlal", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
            jnp.bfloat16,
        )
    )
    y = jax.device_put(
        jnp.asarray(np.random.default_rng(1).integers(0, 1000, BATCH))
    )

    def run_many(params, stats, opt_state, x, y):
        def body(carry, _):
            params, stats, opt_state, tick = carry
            xx = x + (tick * 1e-20).astype(x.dtype)

            def loss_fn(p, s):
                logits, nms = model.apply(
                    {"params": p, "batch_stats": s}, xx, train=True,
                    mutable=["batch_stats"],
                )
                return cross_entropy(logits, y), nms["batch_stats"]

            (loss, stats), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, stats, opt_state, loss), None

        carry, _ = jax.lax.scan(
            body, (params, stats, opt_state, jnp.float32(0.0)),
            None, length=ITERS,
        )
        return carry[3]

    lowered = jax.jit(run_many).lower(params, stats, opt_state, x, y)
    for opts in variants:
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:
            print(json.dumps({"opts": opts, "error": str(e)[:120]}),
                  flush=True)
            continue
        float(compiled(params, stats, opt_state, x, y))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(params, stats, opt_state, x, y))
            times.append(time.perf_counter() - t0)
        ms = min(times) / ITERS * 1e3
        print(json.dumps({"opts": opts, "ms_per_step": round(ms, 1),
                          "img_per_s": round(BATCH / ms * 1e3, 0)}),
              flush=True)


if __name__ == "__main__":
    main()
