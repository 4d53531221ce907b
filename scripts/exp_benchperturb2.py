#!/usr/bin/env python
"""Decompose the stem-bias vs input perturbation gap (11.5k vs 8.4k img/s).

exp_benchperturb.py showed the headline harness (carry perturbs the stem
bias) lets XLA hoist the loop-invariant prefix — the s2d repack + stem conv
on the constant input — out of the scan, while perturbing the INPUT (every
real serving batch is new data) gives 8,448 img/s.  This isolates where the
~3 ms went and re-optimizes the engine under honest measurement:

  A stem-bias mb16 (the old headline form)     — hoists repack+stem conv
  C block1-b1 mb16                             — hoists stem+relu+maxpool too
  F per-chain input perturb mb16               — nothing hoists; chains get
      independently perturbed pre-sliced inputs (rules out the single
      xx-add serializing the chain starts)
  B input mb16 (already measured, re-run as control)
  D input mb16, no-s2d stem                    — is s2d still a win when the
      repack can't be hoisted?
  E input mb{0,8,32}                           — is mb16 still optimal?

Usage: python scripts/exp_benchperturb2.py
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
ITERS = 400


def timeit(fn, *args):
    float(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params, resnet_mrlal_forward

    model = create_model("resnet50_mrlal")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    host_vars = jax.device_get(variables)
    sp = prepare_inference_params(host_vars, dtype=jnp.bfloat16)
    sp_nos2d = {k: v for k, v in sp.items()}
    sp_nos2d["stem"] = {k: v for k, v in sp["stem"].items() if k != "k_s2d"}
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
            jnp.bfloat16,
        )
    )

    def run_perturb_param(path):  # path e.g. ("stem","b") or ("blocks",0,"b1")
        @jax.jit
        def run(sp, x):
            def body(carry, _):
                # rebuild the pytree with ONE leaf perturbed by the carry
                def repl(tree, keys):
                    if len(keys) == 1:
                        k = keys[0]
                        if isinstance(tree, list):
                            tree = list(tree)
                            tree[k] = tree[k] + (carry * 1e-20).astype(tree[k].dtype)
                            return tree
                        tree = dict(tree)
                        tree[k] = tree[k] + (carry * 1e-20).astype(tree[k].dtype)
                        return tree
                    k = keys[0]
                    if isinstance(tree, list):
                        tree = list(tree)
                        tree[k] = repl(tree[k], keys[1:])
                        return tree
                    tree = dict(tree)
                    tree[k] = repl(tree[k], keys[1:])
                    return tree

                p = repl(sp, list(path))
                logits = resnet_mrlal_forward(p, x)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        return run

    @jax.jit
    def run_input(sp, x):
        def body(carry, _):
            xx = x + (carry * 1e-20).astype(x.dtype)
            logits = resnet_mrlal_forward(sp, xx)
            return jnp.sum(logits[:, 0]).astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    @jax.jit
    def run_input_perchain(sp, x):
        mb = 16
        n = BATCH // mb
        xs = [x[i * mb : (i + 1) * mb] for i in range(n)]

        def body(carry, _):
            d = carry * 1e-20
            outs = [
                resnet_mrlal_forward(sp, xi + d.astype(xi.dtype), microbatch=0)
                for xi in xs
            ]
            s = sum(jnp.sum(o[:, 0]) for o in outs)
            return s.astype(jnp.float32), None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return carry

    def run_input_mb(mb):
        @jax.jit
        def run(sp, x):
            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = resnet_mrlal_forward(sp, xx, microbatch=mb)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        return run

    rows = [
        ("A stem-bias mb16", run_perturb_param(("stem", "b")), sp),
        ("C block1-b1 mb16", run_perturb_param(("blocks", 0, "b1")), sp),
        ("F per-chain-input mb16", run_input_perchain, sp),
        ("B input mb16", run_input, sp),
        ("D input mb16 no-s2d", run_input, sp_nos2d),
        ("E input mb8", run_input_mb(8), sp),
        ("E input mb32", run_input_mb(32), sp),
        ("E input mb0", run_input_mb(0), sp),
    ]
    for name, fn, p in rows:
        dt = timeit(fn, p, x)
        print(f"{name}: {BATCH * ITERS / dt:.1f} img/s", flush=True)


if __name__ == "__main__":
    main()
