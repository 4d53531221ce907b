#!/usr/bin/env python
"""Trained-model accuracy delta of the int8 PTQ engine vs bf16.

Random-weight logit closeness (tests/test_serving_quant.py) bounds the
arithmetic error, but the question that matters for a LOSSY serving mode is
top-1 movement on a TRAINED network.  No real dataset ships here (zero
egress), so: train resnet50_mrlal on the learnable synthetic class-template
task on-chip (the train_smoke_tpu.py recipe), then evaluate bf16 vs int8
engines on held-out batches at two noise levels (in-distribution and a
harder 2x-noise split where accuracy sits mid-range and quantization error
has room to move decisions).

Usage: python scripts/exp_quant_acc.py [steps=200]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

BATCH = 128
CLASSES = 10
SIZE = 96
EVAL_BATCHES = 10


def main() -> None:
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params, resnet_mrlal_forward
    from mrla_tpu.serving.quant import (
        prepare_quant_params,
        resnet_mrlal_quant_forward,
    )
    from mrla_tpu.train.losses import cross_entropy

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 200

    rng = np.random.default_rng(0)
    templates = rng.standard_normal((CLASSES, SIZE, SIZE, 3)) * 0.5

    def make_batch(seed, noise=0.5):
        r = np.random.default_rng(seed)
        y = r.integers(0, CLASSES, BATCH)
        x = templates[y] + r.standard_normal((BATCH, SIZE, SIZE, 3)) * noise
        return jnp.asarray(x, jnp.bfloat16), np.asarray(y)

    model = create_model("resnet50_mrlal", num_classes=CLASSES,
                         dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    )
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.05, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, stats, opt_state, x, y):
        def loss_fn(p):
            logits, new_vars = model.apply(
                {"params": p, "batch_stats": stats}, x, train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy(logits, jnp.asarray(y)), new_vars
        (loss, new_vars), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates),
                new_vars["batch_stats"], opt_state, loss)

    for i in range(steps):
        x, y = make_batch(1000 + i)
        params, stats, opt_state, loss = train_step(
            params, stats, opt_state, x, jnp.asarray(y)
        )
        if i % 50 == 0 or i == steps - 1:
            print(f"step {i}: loss {float(loss):.4f}", flush=True)

    trained = jax.device_get({"params": params, "batch_stats": stats})
    sp = prepare_inference_params(trained, dtype=jnp.bfloat16)
    calib_x, _ = make_batch(5)  # training-distribution calibration batch
    calib_x = calib_x.astype(jnp.float32)

    configs = [
        ("absmax  int8-residual", 100.0, True),
        ("p99.9   int8-residual", 99.9, True),
        ("absmax  bf16-residual", 100.0, False),
        ("p99.9   bf16-residual", 99.9, False),
    ]
    trees = {
        pct: prepare_quant_params(trained, calib_x, percentile=pct)
        for pct in {c[1] for c in configs}
    }

    for noise in (0.5, 1.0):
        xs = [make_batch(9000 + j, noise=noise) for j in range(EVAL_BATCHES)]
        lbs = [np.asarray(resnet_mrlal_forward(sp, x)) for x, _ in xs]
        acc_b = np.mean([
            (np.argmax(lb, -1) == y).mean() for lb, (_, y) in zip(lbs, xs)
        ])
        print(f"noise {noise}: bf16 top1 {100 * acc_b:.2f}%", flush=True)
        for label, pct, qres in configs:
            qp = trees[pct]
            n_q = n_agree = total = 0
            for (x, y), lb in zip(xs, lbs):
                lq = np.asarray(resnet_mrlal_quant_forward(
                    qp, x, quant_residual=qres
                ))
                pb, pq = np.argmax(lb, -1), np.argmax(lq, -1)
                n_q += int((pq == y).sum())
                n_agree += int((pb == pq).sum())
                total += len(y)
            print(
                f"  {label}: int8 top1 {100 * n_q / total:.2f}%  "
                f"agreement {100 * n_agree / total:.2f}%",
                flush=True,
            )


if __name__ == "__main__":
    main()
