#!/usr/bin/env python
"""A/B: fused custom-VJP train epilogue vs module path (VERDICT r2 next-1b).

Production config: resnet50_mrlal bs128 bf16 224px, SGD+momentum, scan of
30 steps, one dispatch (exp_trainflags harness).

Usage: python scripts/exp_trainfused.py [fused|ref|both]
"""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np, optax

BATCH = 128
ITERS = 30

def main() -> None:
    jax.config.update("jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from mrla_tpu.models import create_model
    from mrla_tpu.train.losses import cross_entropy

    which = sys.argv[1] if len(sys.argv) > 1 else "both"
    todo = {"fused": [True], "ref": [False]}.get(which, [False, True])

    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)), jnp.bfloat16))
    y = jax.device_put(jnp.asarray(np.random.default_rng(1).integers(0, 1000, BATCH)))

    for fused in todo:
        model = create_model("resnet50_mrlal", dtype=jnp.bfloat16,
                             fused_epilogue=fused)
        variables = jax.jit(lambda r, xx: model.init(r, xx, train=True))(
            jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32))
        params, stats = variables["params"], variables["batch_stats"]
        tx = optax.sgd(0.1, momentum=0.9)
        opt_state = tx.init(params)

        @jax.jit
        def run_many(params, stats, opt_state, x, y, model=model, tx=tx):
            def body(carry, _):
                params, stats, opt_state, tick = carry
                xx = x + (tick * 1e-20).astype(x.dtype)
                def loss_fn(p, s):
                    logits, nms = model.apply(
                        {"params": p, "batch_stats": s}, xx, train=True,
                        mutable=["batch_stats"])
                    return cross_entropy(logits, y), nms["batch_stats"]
                (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params, stats)
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, stats, opt_state, loss), None
            carry, _ = jax.lax.scan(body, (params, stats, opt_state, jnp.float32(0.0)),
                                    None, length=ITERS)
            return carry[3]

        t0 = time.perf_counter()
        float(run_many(params, stats, opt_state, x, y))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_many(params, stats, opt_state, x, y))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) / ITERS * 1e3
        print(f"fused={fused}: {ms:.1f} ms/step = {BATCH/ms*1e3:.0f} img/s "
              f"(compile {compile_s:.0f}s)", flush=True)

if __name__ == "__main__":
    main()
