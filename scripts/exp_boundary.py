#!/usr/bin/env python
"""Quantify the pallas custom-call boundary tax in-model.

Inserts a trivial grid-pipelined VMEM copy kernel (consuming the HWBC
transpose view so the operand layout matches XLA's native {3,0,2,1}) after
each stage-1 block tail of the jnp serving path.  The kernel's own traffic
is read A + write A (A = 205.5 MB at stage 1, bs128 bf16) = 0.50 ms at
819 GB/s.  Any in-model delta beyond ~0.5 ms/insertion is pure boundary
tax (lost fusion pipelining, scheduling, prefetch).

Also times the megatail kernel isolated at stage-1 shape vs its floor.
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
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BATCH = 128
ITERS = 50


def _copy_kernel(x_ref, y_ref):
    y_ref[...] = x_ref[...]


def hwbc_copy(x):  # x: [B,H,W,C] logical
    b, h, w, c = x.shape
    xt = jnp.transpose(x, (1, 2, 0, 3))  # HWBC view == native bytes
    ct = min(128, c)
    bt = 8
    ht = 8 if h % 8 == 0 else h
    spec = pl.BlockSpec((ht, w, bt, ct), lambda k, i, j: (k, 0, i, j),
                        memory_space=pltpu.VMEM)
    yt = pl.pallas_call(
        _copy_kernel,
        grid=(h // ht, b // bt, c // ct),
        in_specs=[spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((h, w, b, c), x.dtype),
    )(xt)
    return jnp.transpose(yt, (2, 0, 1, 3))


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from exp_tail import build, forward

    sp, x = build()

    # -------- in-model: jnp path + N passthrough copies at stage 1
    def fwd_with_copies(sp, x, ncopy):
        from mrla_tpu.serving.resnet_mrlal import _conv, _stem
        from mrla_tpu.kernels.mrla_epilogue import (
            mrla_light_epilogue_reference)
        layers = (3, 4, 6, 3)
        strides = []
        for si, blocks in enumerate(layers):
            for bi in range(blocks):
                strides.append(2 if (si > 0 and bi == 0) else 1)
        x = x.astype(sp["stem"]["k"].dtype)
        y = _stem(x, sp["stem"])
        for i, (p, stride) in enumerate(zip(sp["blocks"], strides)):
            heads = p["lam"].shape[0] // 32
            out = jax.nn.relu(_conv(y, p["k1"], p["b1"]))
            out = jax.nn.relu(_conv(out, p["k2"], p["b2"], stride=stride))
            z = _conv(out, p["k3"], p["b3"])
            identity = (_conv(y, p["kd"], p["bd"], stride=stride)
                        if "kd" in p else y)
            out_act = jax.nn.relu(z + identity)
            y = mrla_light_epilogue_reference(
                out_act, identity, p["wq"], p["wk"], p["wv"], p["lam"],
                p["bn_scale"], p["bn_bias"], heads)
            if i < ncopy:
                y = hwbc_copy(y)
        pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
        fc = sp["fc"]
        return pooled @ fc["k"].astype(jnp.float32) + fc["b"]

    for ncopy in (0, 3):
        def run_many(sp, x, ncopy=ncopy):
            def body(carry, _):
                p = dict(sp)
                stem = dict(p["stem"])
                stem["b"] = stem["b"] + (carry * 1e-20).astype(stem["b"].dtype)
                p["stem"] = stem
                return jnp.sum(fwd_with_copies(p, x, ncopy)[0]).astype(
                    jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)[0]
        compiled = jax.jit(run_many).lower(sp, x).compile()
        float(compiled(sp, x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(sp, x))
            ts.append(time.perf_counter() - t0)
        print(json.dumps({"ncopy": ncopy,
                          "ms_per_iter": round(min(ts) / ITERS * 1000, 3)}),
              flush=True)

    # -------- isolated megatail at stage-1 shape
    from mrla_tpu.kernels.mrla_megatail import mrla_block_tail_fused_next
    from mrla_tpu.kernels.mrla_epilogue import mrla_light_gate
    rng = np.random.default_rng(0)
    B, H, W, C, C1 = BATCH, 56, 56, 256, 64
    out = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, W, C)), jnp.bfloat16))
    idn = jax.device_put(jnp.asarray(
        rng.standard_normal((B, H, W, C)), jnp.bfloat16))
    gate = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    wv = jnp.asarray(rng.standard_normal((3, 3, 1, C)), jnp.float32)
    lam = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    sc = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    bi = jnp.asarray(rng.standard_normal((C,)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((C, C1)) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.standard_normal((C1,)), jnp.float32)

    @jax.jit
    def mt_many(out, idn, gate, wv, lam, sc, bi, w1, b1):
        def body(carry, _):
            y, x1 = mrla_block_tail_fused_next(
                out, idn, gate + carry * 1e-20, wv, lam, sc, bi, w1, b1)
            return jnp.sum(x1[0, 0, 0].astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=20)[0]

    float(mt_many(out, idn, gate, wv, lam, sc, bi, w1, b1))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(mt_many(out, idn, gate, wv, lam, sc, bi, w1, b1))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"megatail_isolated_ms": round(min(ts) / 20 * 1000, 3),
                      "floor_ms": 0.81}), flush=True)

    # isolated hwbc_copy
    @jax.jit
    def cp_many(out):
        def body(carry, _):
            y = hwbc_copy(out + (carry * 1e-20).astype(out.dtype))
            return jnp.sum(y[0, 0, 0].astype(jnp.float32)), None
        return jax.lax.scan(body, jnp.float32(0.0), None, length=20)[0]
    float(cp_many(out))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(cp_many(out))
        ts.append(time.perf_counter() - t0)
    print(json.dumps({"hwbc_copy_isolated_ms": round(min(ts) / 20 * 1000, 3),
                      "floor_ms": 0.50}), flush=True)


if __name__ == "__main__":
    main()
