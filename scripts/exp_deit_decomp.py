#!/usr/bin/env python
"""DeiT-MRLA serving decomposition ledger (VERDICT round-3 weak #4).

The honest DeiT serving number (deit_mrlal_small bs128 mb16: ~5.8k img/s)
sits at ~13% of MXU peak; the round-3 claim that the gap is
"barrier/elementwise-bound" was asserted from the roofline, not measured.
This pins WHERE the time goes, conv-engine style:

  1. full-model rates: deit_mrlal_small vs plain deit_small (identical
     geometry minus the MRLA tail) — the tail's in-model cost is the
     difference, at mb0 and mb16;
  2. isolated per-component stacks at the real serving shapes
     (12 sequential applications, input-perturbed scan, bs128 bf16):
     patch-embed, LayerNorm, Attention, Mlp, MRLA token tail
     (normx+normo+GAP+conv1d+gate+dwconv+lambda);
  3. FLOPs model per component -> per-component MXU utilization, so the
     ledger states which slice is matmul-bound and which is
     barrier-bound.

Run on the real chip: `python scripts/exp_deit_decomp.py`.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from mrla_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

BS = 128
N, C, HEADS = 197, 384, 6
DEPTH = 12
ITERS = 30
V5E_BF16_TFLOPS = 197.0


def bench_scan(name, apply_fn, x0, flops_per_iter=None):
    """Time ITERS sequential applications with a carried perturbation."""

    @jax.jit
    def run(x):
        def body(carry, _):
            y = apply_fn(x + carry.astype(x.dtype))
            return jnp.mean(y.astype(jnp.float32)) * 1e-20, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    float(run(x0))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x0))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    extra = ""
    if flops_per_iter:
        util = flops_per_iter / dt / (V5E_BF16_TFLOPS * 1e12)
        extra = f"  ({flops_per_iter/1e9:.1f} GFLOP, {util*100:.0f}% MXU)"
    print(f"  {name}: {dt*1e3:.3f} ms{extra}", flush=True)
    return dt


def main():
    from mrla_tpu.models import create_model
    from mrla_tpu.models.deit import Attention, Mlp, layer_norm
    from mrla_tpu.models.deit_mrla import MRLALightTokenModule
    from mrla_tpu.serving.deit import (
        deit_forward, prepare_deit_inference_params)

    rng = jax.random.PRNGKey(0)
    x_img = jax.random.normal(jax.random.PRNGKey(1), (BS, 224, 224, 3),
                              jnp.bfloat16)

    print("== full-model rates (bs128 bf16 224px, input-perturbed) ==",
          flush=True)
    full_ms = {}
    for arch in ("deit_mrlal_small_patch16_224", "deit_small_patch16_224"):
        model = create_model(arch)
        variables = model.init(rng, jnp.zeros((1, 224, 224, 3)), train=False)
        m, cast = prepare_deit_inference_params(arch, variables)
        for mb in (0, 16):
            f = lambda x: deit_forward(m, cast, x, microbatch=mb)

            @jax.jit
            def run(x):
                def body(carry, _):
                    out = f(x + carry * 1e-20)
                    return jnp.sum(out[:, 0]) * 1e-30, None

                c, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=ITERS)
                return c

            float(run(x_img))
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                float(run(x_img))
                times.append(time.perf_counter() - t0)
            dt = min(times) / ITERS
            full_ms[(arch, mb)] = dt * 1e3
            print(f"  {arch} mb{mb}: {dt*1e3:.2f} ms = {BS/dt:,.0f} img/s",
                  flush=True)
    d0 = (full_ms[("deit_mrlal_small_patch16_224", 0)]
          - full_ms[("deit_small_patch16_224", 0)])
    d16 = (full_ms[("deit_mrlal_small_patch16_224", 16)]
           - full_ms[("deit_small_patch16_224", 16)])
    print(f"  MRLA tail in-model cost: mb0 {d0:.2f} ms, mb16 {d16:.2f} ms",
          flush=True)

    print("== isolated components (12x stacks, bs128, real shapes) ==",
          flush=True)
    dt_tok = jnp.bfloat16
    x_tok = jax.random.normal(jax.random.PRNGKey(2), (BS, N, C), dt_tok)

    # FLOPs per 12-block stack (2 FLOP per MAC), bs128
    f_attn = DEPTH * BS * (2 * N * C * 3 * C + 2 * N * N * C * 2
                           + 2 * N * C * C)
    f_mlp = DEPTH * BS * 2 * N * C * 4 * C * 2
    f_ln = DEPTH * BS * N * C * 8  # elementwise estimate
    f_tail = DEPTH * BS * (2 * N * C * 10)  # dwconv9 + conv1d taps approx

    ln_mod = layer_norm(dt_tok, "ln")
    ln_vars = ln_mod.init(rng, x_tok)
    bench_scan(
        "LayerNorm x12      ",
        lambda x: _stack(lambda y: ln_mod.apply(ln_vars, y), x, DEPTH),
        x_tok, f_ln)

    attn_mod = Attention(HEADS, True, 0.0, 0.0, dt_tok)
    attn_vars = attn_mod.init(rng, x_tok, True)
    bench_scan(
        "Attention x12      ",
        lambda x: _stack(lambda y: attn_mod.apply(attn_vars, y, True), x,
                         DEPTH),
        x_tok, f_attn)

    mlp_mod = Mlp(4 * C, 0.0, dt_tok)
    mlp_vars = mlp_mod.init(rng, x_tok, True)
    bench_scan(
        "Mlp x12            ",
        lambda x: _stack(lambda y: mlp_mod.apply(mlp_vars, y, True), x,
                         DEPTH),
        x_tok, f_mlp)

    tail_mod = MRLALightTokenModule(16)
    tail_vars = tail_mod.init(rng, x_tok, x_tok)
    bench_scan(
        "MRLA token tail x12",
        lambda x: _stack(lambda y: tail_mod.apply(tail_vars, y, y), x,
                         DEPTH),
        x_tok, f_tail)

    # patch embed (once per image)
    model = create_model("deit_small_patch16_224")
    pe_vars = model.init(rng, jnp.zeros((1, 224, 224, 3)), train=False)
    from mrla_tpu.models.deit import PatchEmbed

    pe = PatchEmbed(16, C, dt_tok)
    pev = {"params": pe_vars["params"]["patch_embed"]}
    f_pe = BS * 2 * (224 // 16) ** 2 * C * (16 * 16 * 3)
    bench_scan("PatchEmbed x1      ",
               lambda x: pe.apply(pev, x), x_img, f_pe)


def _stack(fn, x, depth):
    y = x
    for _ in range(depth):
        y = fn(y)
    return y


if __name__ == "__main__":
    main()
