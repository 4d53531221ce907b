#!/usr/bin/env python
"""Experiment: microbatch-chain splitting of the TRAIN step.

The serving engine got +45% by tracing the batch as independent 16-image
chains in one program (each MRLA gate's global GAP is a scheduling barrier;
independent chains let XLA overlap one chain's barrier with another's conv
work).  In training, BatchNorm couples the batch (train-mode batch stats),
so chains are only independent if each chain computes ITS OWN BN stats —
which is exactly torch DDP's semantics (per-replica BN over the local
batch; the reference trains resnet50_mrlal with plain BN under DDP,
/root/reference/resnet/train.py:153-179, SyncBN commented out).  A chain
here == a DDP replica of size `mb`.

Measures ms/step for the unsplit baseline vs chain counts, bs128 bf16
224px, SGD+momentum, same scan-carry methodology as bench.py.

Usage: python scripts/exp_trainsplit.py [mb0 mb1 ...]   (0 = unsplit)
"""

from __future__ import annotations

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

    mbs = [int(a) for a in sys.argv[1:]] or [0, 16, 32]

    model = create_model("resnet50_mrlal", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    params, batch_stats = variables["params"], variables["batch_stats"]
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

    def make_step(mb: int):
        n = BATCH // mb if mb else 1

        def loss_fn(params, stats, xx, yy):
            if n == 1:
                logits, nms = model.apply(
                    {"params": params, "batch_stats": stats},
                    xx, train=True, mutable=["batch_stats"],
                )
                return cross_entropy(logits, yy), nms["batch_stats"]
            losses, stats_out = [], []
            for i in range(n):
                logits, nms = model.apply(
                    {"params": params, "batch_stats": stats},
                    xx[i * mb : (i + 1) * mb],
                    train=True, mutable=["batch_stats"],
                )
                losses.append(cross_entropy(logits, yy[i * mb : (i + 1) * mb]))
                stats_out.append(nms["batch_stats"])
            stats_new = jax.tree.map(
                lambda *a: sum(a) / n, *stats_out
            )
            return sum(losses) / n, stats_new

        @jax.jit
        def run_many(params, stats, opt_state, x, y):
            def body(carry, _):
                params, stats, opt_state, tick = carry
                xx = x + (tick * 1e-20).astype(x.dtype)
                (loss, stats), grads = jax.value_and_grad(
                    loss_fn, has_aux=True
                )(params, stats, xx, y)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, stats, opt_state, loss), None

            carry, _ = jax.lax.scan(
                body, (params, stats, opt_state, jnp.float32(0.0)),
                None, length=ITERS,
            )
            return carry[3]

        return run_many

    for mb in mbs:
        run_many = make_step(mb)
        float(run_many(params, batch_stats, opt_state, x, y))  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_many(params, batch_stats, opt_state, x, y))
            times.append(time.perf_counter() - t0)
        ms = min(times) / ITERS * 1e3
        print(f"train mb={mb or BATCH}: {ms:.1f} ms/step = "
              f"{BATCH / ms * 1e3:.0f} img/s", flush=True)


if __name__ == "__main__":
    main()
