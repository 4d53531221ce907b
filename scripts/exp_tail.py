#!/usr/bin/env python
"""In-model A/B of MRLA tail implementations (serving, bs128 bf16 224px).

Variants:
  jnp       — shipped default (mrla_light_epilogue_reference everywhere)
  ep1       — Pallas fused epilogue (kernels/mrla_epilogue._fused_call) on
              stage-1 blocks (W=56 supports_shape), jnp elsewhere
  megatail1 — megatail kernel stage-1 only (hwbc_min_w=56)
  megatail12— megatail stages 1-2 (hwbc_min_w=28, the round-2 losing config)

Same one-dispatch scan methodology as bench.py.
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

BATCH = 128
ITERS = 50


def build():
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import prepare_inference_params

    model = create_model("resnet50_mrlal")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    sp = prepare_inference_params(jax.device_get(variables), dtype=jnp.bfloat16)
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
            jnp.bfloat16,
        )
    )
    return sp, x


def forward(sp, x, mode: str):
    from mrla_tpu.serving.resnet_mrlal import _conv, _stem
    from mrla_tpu.kernels.mrla_epilogue import (
        mrla_light_epilogue_reference,
        mrla_light_gate,
        mrla_light_epilogue_pallas,
        supports_shape,
    )
    from mrla_tpu.kernels.mrla_megatail import mrla_block_tail_fused_next

    layers = (3, 4, 6, 3)
    dim_perhead = 32
    strides = []
    for si, blocks in enumerate(layers):
        for bi in range(blocks):
            strides.append(2 if (si > 0 and bi == 0) else 1)

    x = x.astype(sp["stem"]["k"].dtype)
    if mode == "s2dslice":
        from mrla_tpu.ops.common import max_pool_same_torch
        pstem = sp["stem"]
        bsz, h, w, cin = x.shape
        xp = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        xs = jnp.concatenate(
            [xp[:, py::2, px::2, :] for py in (0, 1) for px in (0, 1)],
            axis=-1,
        )
        y = jax.lax.conv_general_dilated(
            xs, pstem["k_s2d"], (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = jax.nn.relu(y + pstem["b"].astype(y.dtype))
        y = max_pool_same_torch(y, 3, 2)
    else:
        y = _stem(x, sp["stem"])
    blocks = sp["blocks"]
    x1_pre = None
    for i, (p, stride) in enumerate(zip(blocks, strides)):
        heads = p["lam"].shape[0] // dim_perhead
        out = (
            x1_pre if x1_pre is not None
            else jax.nn.relu(_conv(y, p["k1"], p["b1"]))
        )
        x1_pre = None
        out = jax.nn.relu(_conv(out, p["k2"], p["b2"], stride=stride))
        z = _conv(out, p["k3"], p["b3"])
        identity = _conv(y, p["kd"], p["bd"], stride=stride) if "kd" in p else y
        b, h, w, c = z.shape

        if mode.startswith("rowtail") or mode.startswith("rt"):
            from mrla_tpu.kernels.mrla_rowtail import mrla_rowtail
            min_w = {"rowtail1": 56, "rowtail12": 28, "rowtail": 0,
                     "rtv2": 0, "rtv2_234": 28, "rtv3": 28}.get(mode, 10**9)
            if w >= min_w:
                out_act = jax.nn.relu(z + identity)  # bf16, fuses into conv3
                gate = mrla_light_gate(out_act, p["wq"], p["wk"], heads)
                p_next = blocks[i + 1] if i + 1 < len(blocks) else None
                # x1 (in-kernel next conv1) only when C1 >= 128: narrower
                # needs lane padding whose strip-off slice costs a 51MB
                # relayout copy (measured — the rowtail1 in-model loss)
                want_x1 = (p_next is not None
                           and p_next["k1"].shape[-1] >= 128
                           and mode != "rtv3")
                if want_x1:
                    y, x1_pre = mrla_rowtail(
                        out_act, identity, gate, p["wv"], p["lam"],
                        p["bn_scale"], p["bn_bias"],
                        p_next["k1"], p_next["b1"])
                else:
                    y = mrla_rowtail(
                        out_act, identity, gate, p["wv"], p["lam"],
                        p["bn_scale"], p["bn_bias"])
                continue
        min_w = {"megatail1": 56, "megatail12": 28}.get(mode, 10**9)
        if mode.startswith("megatail") and w >= min_w and i + 1 < len(blocks):
            out_act = jax.nn.relu(
                z.astype(jnp.float32) + identity.astype(jnp.float32)
            ).astype(z.dtype)
            gate = mrla_light_gate(out_act, p["wq"], p["wk"], heads)
            p_next = blocks[i + 1]
            y, x1_pre = mrla_block_tail_fused_next(
                out_act, identity, gate, p["wv"], p["lam"],
                p["bn_scale"], p["bn_bias"], p_next["k1"], p_next["b1"],
            )
            continue
        out_act = jax.nn.relu(z + identity)
        if mode == "plain":  # no MRLA at all (plain resnet50 w/ BN folded)
            y = out_act
            continue
        if mode in ("nodw", "nogate", "noid"):
            from mrla_tpu.ops.common import depthwise_conv3x3
            gate = mrla_light_gate(out_act, p["wq"], p["wk"], heads)
            v = out_act if mode == "nodw" else depthwise_conv3x3(out_act, p["wv"])
            g = 1.0 if mode == "nogate" else gate[:, None, None, :]
            lid = 0.0 if mode == "noid" else (
                p["lam"].astype(jnp.float32) * identity.astype(jnp.float32))
            mr = v.astype(jnp.float32) * g + lid
            y = (out_act.astype(jnp.float32) + mr * p["bn_scale"]
                 + p["bn_bias"]).astype(out_act.dtype)
            continue
        if mode in ("fold", "foldbf16", "s2dslice"):
            from mrla_tpu.ops.common import depthwise_conv3x3
            gate = mrla_light_gate(out_act, p["wq"], p["wk"], heads)  # [B,C] f32
            gs = gate * p["bn_scale"][None, :]  # [B,C] f32
            ls = (p["lam"] * p["bn_scale"]).astype(jnp.float32)  # [C]
            v = depthwise_conv3x3(out_act, p["wv"])
            if mode == "foldbf16":
                dt = out_act.dtype
                y = (out_act
                     + v * gs[:, None, None, :].astype(dt)
                     + (ls.astype(dt) * identity
                        + p["bn_bias"].astype(dt)))
            else:
                y = (out_act.astype(jnp.float32)
                     + v.astype(jnp.float32) * gs[:, None, None, :]
                     + ls * identity.astype(jnp.float32)
                     + p["bn_bias"]).astype(out_act.dtype)
            continue
        if mode == "ep1" and supports_shape(h, w, c):
            y = mrla_light_epilogue_pallas(
                out_act, identity, p["wq"], p["wk"], p["wv"], p["lam"],
                p["bn_scale"], p["bn_bias"], heads,
            )
        else:
            y = mrla_light_epilogue_reference(
                out_act, identity, p["wq"], p["wk"], p["wv"], p["lam"],
                p["bn_scale"], p["bn_bias"], heads,
            )
    pooled = jnp.mean(y.astype(jnp.float32), axis=(1, 2))
    fc = sp["fc"]
    return pooled @ fc["k"].astype(jnp.float32) + fc["b"]


def main():
    modes = sys.argv[1:] or ["jnp", "ep1"]
    sp, x = build()
    for mode in modes:
        def run_many(sp, x, mode=mode):
            def body(carry, _):
                p = dict(sp)
                stem = dict(p["stem"])
                stem["b"] = stem["b"] + (carry * 1e-20).astype(stem["b"].dtype)
                p["stem"] = stem
                logits = forward(p, x, mode)
                return jnp.sum(logits[0]).astype(jnp.float32), None
            return jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)[0]

        t0 = time.perf_counter()
        compiled = jax.jit(run_many).lower(sp, x).compile()
        ct = time.perf_counter() - t0
        float(compiled(sp, x))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(compiled(sp, x))
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(json.dumps({
            "mode": mode,
            "img_per_s": round(BATCH * ITERS / dt, 1),
            "ms_per_iter": round(dt / ITERS * 1000, 3),
            "compile_s": round(ct, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
