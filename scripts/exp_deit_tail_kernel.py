#!/usr/bin/env python
"""In-model verdict for the fused DeiT token-tail kernel (round-5 item 3).

The decomposition ledger (exp_deit_decomp.py) pinned the MRLA token tail
at 4.73 ms of the 21.79 ms bs128/mb16 deit_mrlal_small step (~22%, ~0%
MXU).  This measures the one fusion attempt the verdict asked for:
kernels/deit_token_tail.py runs the whole tail (2 LN + GAP + 2 conv1d +
head gate + dwconv3x3 + GELU + λ-add + cls bypass + residual) as ONE
Pallas program per mb16 chain.

Rows (bs128 bf16 224px, honest input-perturbed scan):
  model.apply mb16        — the shipped jnp serving path
  rebuilt-jnp mb16        — this harness's forward with jnp tails
                            (validates the harness: must match 1st row)
  kernel-tail mb16        — same forward, Pallas tail

plus on-chip logit parity kernel-vs-jnp.
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
MB = 16
ITERS = 30
ARCH = "deit_mrlal_small_patch16_224"
EMBED, DEPTH, HEADS = 384, 12, 6


def build_forwards():
    import flax.linen as nn

    from mrla_tpu.kernels.deit_token_tail import (
        deit_token_tail, extract_tail_params, pack_tail_params)
    from mrla_tpu.models import create_model
    from mrla_tpu.models.deit import Attention, Mlp, PatchEmbed
    from mrla_tpu.models.deit_mrla import MRLALightTokenModule
    from mrla_tpu.serving.deit import (
        deit_forward, prepare_deit_inference_params)

    model = create_model(ARCH)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 224, 224, 3)), train=False
    )
    m_cast, cast = prepare_deit_inference_params(ARCH, variables)
    P = cast["params"]
    dtype = jnp.bfloat16

    packed = [
        pack_tail_params(extract_tail_params(P[f"block{i}"]))
        for i in range(DEPTH)
    ]

    pe = PatchEmbed(16, EMBED, dtype)
    ln = lambda: nn.LayerNorm(epsilon=1e-6, dtype=dtype)
    attn_m = Attention(HEADS, True, 0.0, 0.0, dtype)
    mlp_m = Mlp(4 * EMBED, 0.0, dtype)
    tail_m = MRLALightTokenModule(16)

    # Recurrence wiring per MRLAViTBlock: ot = BLOCK INPUT (pre-attention
    # x); the tail consumes (x_post_mlp, ot) and the block adds its output.
    def chain2(x, use_kernel: bool):
        b = x.shape[0]
        t = pe.apply({"params": P["patch_embed"]}, x.astype(dtype))
        cls = jnp.broadcast_to(
            P["cls_token"].astype(dtype), (b, 1, EMBED))
        h = jnp.concatenate([cls, t], axis=1)
        h = h + P["pos_embed"].astype(dtype)
        for i in range(DEPTH):
            bp = P[f"block{i}"]
            ot = h  # block input feeds the light recurrence
            y = attn_m.apply(
                {"params": bp["attn"]},
                ln().apply({"params": bp["norm1"]}, h), True)
            h = h + y
            y = mlp_m.apply(
                {"params": bp["mlp"]},
                ln().apply({"params": bp["norm2"]}, h), True)
            h = h + y
            if use_kernel:
                w, taps = packed[i]
                h = deit_token_tail(h, ot, w, taps)
            else:
                h = h + tail_m.apply({"params": bp["mrla"]}, h, ot)
        h = ln().apply({"params": P["norm"]}, h)
        logits = (h[:, 0].astype(jnp.float32)
                  @ P["head"]["kernel"].astype(jnp.float32)
                  + P["head"]["bias"].astype(jnp.float32))
        return logits

    def microbatched(x, use_kernel):
        return jnp.concatenate(
            [chain2(x[i * MB:(i + 1) * MB], use_kernel)
             for i in range(x.shape[0] // MB)], axis=0)

    shipped = lambda x: deit_forward(m_cast, cast, x, microbatch=MB)
    rebuilt = lambda x: microbatched(x, False)
    kernel = lambda x: microbatched(x, True)
    return shipped, rebuilt, kernel


def bench(name, f, x):
    @jax.jit
    def run(x):
        def body(carry, _):
            out = f(x + carry * 1e-20)
            return jnp.sum(out[:, 0]) * 1e-30, None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    float(run(x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(x))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    print(f"  {name}: {dt*1e3:.2f} ms = {BS/dt:,.0f} img/s", flush=True)
    return dt


def main():
    shipped, rebuilt, kernel = build_forwards()
    x = jax.random.normal(jax.random.PRNGKey(1), (BS, 224, 224, 3),
                          jnp.bfloat16)

    print("logit parity (bs16 slice, bf16):", flush=True)
    a = np.asarray(shipped(x[:MB]))
    b = np.asarray(rebuilt(x[:MB]))
    c = np.asarray(kernel(x[:MB]))
    s = np.abs(a).max()
    print(f"  rebuilt-vs-shipped rel {np.abs(a - b).max() / s:.2e}",
          flush=True)
    print(f"  kernel-vs-shipped  rel {np.abs(a - c).max() / s:.2e}",
          flush=True)

    print(f"in-model serving, bs{BS} mb{MB} bf16 224px:", flush=True)
    bench("model.apply mb16 (shipped)", shipped, x)
    bench("rebuilt-jnp mb16          ", rebuilt, x)
    bench("kernel-tail mb16          ", kernel, x)


if __name__ == "__main__":
    main()
