#!/usr/bin/env python
"""Cost-model accounting for the (cached) production train-step program."""
from __future__ import annotations
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, optax

BATCH, ITERS, HBM_GBPS, PEAK_TF = 128, 30, 819.0, 197.0

def main():
    jax.config.update("jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from mrla_tpu.models import create_model
    from mrla_tpu.train.losses import cross_entropy

    fused = sys.argv[1] == "fused" if len(sys.argv) > 1 else False
    model = create_model("resnet50_mrlal", dtype=jnp.bfloat16, fused_epilogue=fused)
    variables = jax.jit(lambda r, xx: model.init(r, xx, train=True))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
    params, stats = variables["params"], variables["batch_stats"]
    tx = optax.sgd(0.1, momentum=0.9)
    opt_state = tx.init(params)
    x = jnp.zeros((BATCH, 224, 224, 3), jnp.bfloat16)
    y = jnp.zeros((BATCH,), jnp.int32)

    def run_many(params, stats, opt_state, x, y):
        def body(carry, _):
            params, stats, opt_state, tick = carry
            xx = x + (tick * 1e-20).astype(x.dtype)
            def loss_fn(p, s):
                logits, nms = model.apply({"params": p, "batch_stats": s}, xx,
                                          train=True, mutable=["batch_stats"])
                return cross_entropy(logits, y), nms["batch_stats"]
            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, stats, opt_state, loss), None
        carry, _ = jax.lax.scan(body, (params, stats, opt_state, jnp.float32(0.0)),
                                None, length=ITERS)
        return carry[3]

    compiled = jax.jit(run_many).lower(params, stats, opt_state, x, y).compile()
    ca = compiled.cost_analysis()
    by = ca.get("bytes accessed", 0.0) / ITERS
    fl = ca.get("flops", 0.0) / ITERS
    print(f"fused={fused}: per-step cost-model bytes {by/1e9:.2f} GB -> "
          f"bw-roofline {by/1e9/HBM_GBPS*1e3:.1f} ms; flops {fl/1e12:.2f} TF "
          f"-> mxu-roofline {fl/1e12/PEAK_TF*1e3:.1f} ms", flush=True)

if __name__ == "__main__":
    main()
