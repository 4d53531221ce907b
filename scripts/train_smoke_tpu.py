#!/usr/bin/env python
"""Real-chip training smoke: optimize resnet50_mrlal on a learnable
synthetic task and report the loss/accuracy trajectory.

No real dataset ships in this environment (zero egress), so the task is
procedural: each class is a distinct random spatial template + per-sample
noise.  A working trainer must drive loss well below ln(num_classes) and
accuracy to ~100% on the training distribution within a few hundred steps;
a broken gradient path / BN wiring / optimizer cannot.

Usage: python scripts/train_smoke_tpu.py [steps=300]
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
CLASSES = 10
SIZE = 96


def main() -> None:
    from mrla_tpu.models import create_model
    from mrla_tpu.train.losses import cross_entropy

    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 300

    rng = np.random.default_rng(0)
    templates = rng.standard_normal((CLASSES, SIZE, SIZE, 3)) * 0.5

    def make_batch(seed):
        r = np.random.default_rng(seed)
        y = r.integers(0, CLASSES, BATCH)
        x = templates[y] + r.standard_normal((BATCH, SIZE, SIZE, 3)) * 0.5
        return jnp.asarray(x, jnp.bfloat16), jnp.asarray(y)

    model = create_model("resnet50_mrlal", num_classes=CLASSES,
                         dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.key(0), jnp.zeros((1, SIZE, SIZE, 3), jnp.float32)
    )
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.05, momentum=0.9)
    opt_state = tx.init(params)

    @jax.jit
    def run_chunk(params, stats, opt_state, xs, ys):
        def body(carry, batch):
            params, stats, opt_state = carry
            x, y = batch

            def loss_fn(p, s):
                logits, nms = model.apply(
                    {"params": p, "batch_stats": s}, x, train=True,
                    mutable=["batch_stats"],
                )
                return cross_entropy(logits, y), (nms["batch_stats"], logits)

            (loss, (stats, logits)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params, stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            acc = jnp.mean((jnp.argmax(logits, -1) == y).astype(jnp.float32))
            return (params, stats, opt_state), (loss, acc)

        (params, stats, opt_state), (losses, accs) = jax.lax.scan(
            body, (params, stats, opt_state), (xs, ys)
        )
        return params, stats, opt_state, losses, accs

    chunk = 50
    t0 = time.perf_counter()
    for start in range(0, steps, chunk):
        xs, ys = zip(*(make_batch(1000 + start + i) for i in range(chunk)))
        xs = jnp.stack(xs)
        ys = jnp.stack(ys)
        params, stats, opt_state, losses, accs = run_chunk(
            params, stats, opt_state, xs, ys
        )
        print(
            f"step {start + chunk:4d}: loss {float(losses[-1]):.4f} "
            f"acc {float(accs[-1]):.3f}",
            flush=True,
        )
    dt = time.perf_counter() - t0
    final_loss, final_acc = float(losses[-1]), float(accs[-1])
    print(f"done: {steps} steps in {dt:.1f}s "
          f"({steps * BATCH / dt:.0f} img/s incl. host datagen + compile); "
          f"final loss {final_loss:.4f}, acc {final_acc:.3f}")
    assert final_loss < 0.5 and final_acc > 0.9, "trainer failed to learn"


if __name__ == "__main__":
    main()
