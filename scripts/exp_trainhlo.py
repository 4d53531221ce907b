#!/usr/bin/env python
"""Train-step HBM traffic decomposition (VERDICT r2 next-1b, measure-first):
compile ONE resnet50_mrlal train step (bs128 bf16 224px, SGD+momentum,
the exp_trainflags harness config), dump the optimized HLO, and aggregate
per-op HBM bytes the same way scripts/hlo_traffic.py did for serving.

Prints: total HBM bytes, implied roofline ms at 819 GB/s, and the top
source lines by traffic — the decision input for any fused-VJP work.

Usage: python scripts/exp_trainhlo.py [dump_path=/tmp/train_step.hlo]
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
HBM_GBPS = 819.0


def build_step():
    from mrla_tpu.models import create_model
    from mrla_tpu.train.losses import cross_entropy

    model = create_model("resnet50_mrlal", dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
        jnp.bfloat16,
    )
    y = jnp.asarray(np.random.default_rng(1).integers(0, 1000, BATCH))

    def train_step(params, stats, opt_state, x, y):
        def loss_fn(p, s):
            logits, nms = model.apply(
                {"params": p, "batch_stats": s}, x, train=True,
                mutable=["batch_stats"],
            )
            return cross_entropy(logits, y), nms["batch_stats"]

        (loss, stats2), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, stats
        )
        updates, opt_state2 = tx.update(grads, opt_state, params)
        params2 = optax.apply_updates(params, updates)
        return params2, stats2, opt_state2, loss

    return train_step, (params, stats, opt_state, x, y)


def main() -> None:
    dump = sys.argv[1] if len(sys.argv) > 1 else "/tmp/train_step.hlo"
    step, args = build_step()
    compiled = jax.jit(step).lower(*args).compile()
    txt = compiled.as_text()
    with open(dump, "w") as f:
        f.write(txt)
    print(f"wrote {len(txt) / 1e6:.1f} MB HLO to {dump}", flush=True)

    # cost-analysis totals
    ca = compiled.cost_analysis()
    if ca:
        ba = ca.get("bytes accessed", 0.0)
        print(
            f"cost-analysis bytes accessed: {ba / 1e9:.2f} GB "
            f"-> roofline {ba / 1e9 / HBM_GBPS * 1e3:.1f} ms @ {HBM_GBPS} GB/s; "
            f"flops {ca.get('flops', 0) / 1e12:.2f} TF",
            flush=True,
        )

    # per-source-line aggregation (reuse hlo_traffic's parser)
    sys.argv = ["hlo_traffic", dump]
    import hlo_traffic

    hlo_traffic.main(dump)


if __name__ == "__main__":
    main()
