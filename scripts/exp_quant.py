#!/usr/bin/env python
"""int8 PTQ serving engine: throughput + fidelity vs the bf16 engine.

Phase 0 proves s8xs8->s32 conv lowers on this chip at all; then the full
engine is measured on the honest input-perturbed harness (bs128 224px) and
its logits compared against the bf16 engine on held-out inputs.

Usage: python scripts/exp_quant.py [mb ...]
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
    from mrla_tpu.serving.quant import (
        prepare_quant_params,
        resnet_mrlal_quant_forward,
    )

    # ---- phase 0: does int8 conv lower on this backend?
    rng = np.random.default_rng(0)
    xq = jnp.asarray(rng.integers(-127, 128, (8, 56, 56, 128)), jnp.int8)
    kq = jnp.asarray(rng.integers(-127, 128, (3, 3, 128, 128)), jnp.int8)

    @jax.jit
    def conv_i8(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )

    out = conv_i8(xq, kq)
    ref = jax.lax.conv_general_dilated(
        xq.astype(jnp.float32), kq.astype(jnp.float32), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    exact = bool(jnp.all(out.astype(jnp.float32) == ref))
    print(f"phase0 int8 conv: dtype={out.dtype} exact_vs_f32={exact}", flush=True)

    # int8 vs bf16 conv speed at a stage-2-ish shape
    xb = jnp.asarray(rng.standard_normal((128, 28, 28, 512)), jnp.bfloat16)
    kb = jnp.asarray(rng.standard_normal((3, 3, 512, 512)), jnp.bfloat16)
    xi = jnp.asarray(rng.integers(-127, 128, (128, 28, 28, 512)), jnp.int8)
    ki = jnp.asarray(rng.integers(-127, 128, (3, 3, 512, 512)), jnp.int8)

    def scan_conv(conv, x, k, n=100):
        # honest harness: the input must be iteration-dependent or XLA
        # hoists the conv out of the scan (ROADMAP round-3 audit)
        @jax.jit
        def run(x, k):
            def body(c, _):
                if x.dtype == jnp.int8:
                    xx = jnp.bitwise_xor(x, (c & 1).astype(jnp.int8))
                else:
                    xx = x + (c.astype(jnp.float32) * 1e-20).astype(x.dtype)
                y = conv(xx, k)
                # consume the FULL output (a sum) or XLA dead-code-
                # eliminates the conv down to the one element the carry
                # reads
                return jnp.sum(y.astype(jnp.float32)).astype(jnp.int32), None

            c, _ = jax.lax.scan(body, jnp.int32(0), None, length=n)
            return c
        return run

    def conv_bf(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    t_i8 = timeit(scan_conv(conv_i8, xi, ki), xi, ki)
    t_bf = timeit(scan_conv(conv_bf, xb, kb), xb, kb)
    print(f"phase0 conv 100x [128,28,28,512]x3x3: int8 {t_i8*1e3:.1f} ms  "
          f"bf16 {t_bf*1e3:.1f} ms  ratio {t_bf/t_i8:.2f}x", flush=True)
    if sys.argv[1:] == ["p0"]:
        return

    # ---- phase 1: full engine
    model = create_model("resnet50_mrlal")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    variables = jax.device_get(variables)
    calib = jnp.asarray(
        rng.standard_normal((32, 224, 224, 3)), jnp.float32
    )
    sp = prepare_inference_params(variables, dtype=jnp.bfloat16)
    qp = prepare_quant_params(variables, calib)

    x_eval = jnp.asarray(
        np.random.default_rng(7).standard_normal((BATCH, 224, 224, 3)),
        jnp.bfloat16,
    )
    lb = np.asarray(resnet_mrlal_forward(sp, x_eval))
    for qe in (False, True):
        lq = np.asarray(
            resnet_mrlal_quant_forward(qp, x_eval, quant_epilogue=qe)
        )
        agree = float(np.mean(np.argmax(lb, -1) == np.argmax(lq, -1)))
        err = float(np.max(np.abs(lb - lq)))
        rel = float(np.max(np.abs(lb - lq)) / (np.max(np.abs(lb)) + 1e-9))
        print(f"fidelity qepi={qe} (random weights): top1 agree {agree:.3f}  "
              f"max|Δlogit| {err:.4f}  rel {rel:.4f}", flush=True)

    seq_only = sys.argv[1:] == ["seq"]
    mbs = ([] if seq_only
           else [int(a) for a in sys.argv[1:]] or [0, 16, 32, 64])
    x = jax.device_put(x_eval)

    def run_q(mb, qe, qres=True):
        @jax.jit
        def run(qp, x):
            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = resnet_mrlal_quant_forward(
                    qp, xx, microbatch=mb, quant_epilogue=qe,
                    quant_residual=qres,
                )
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        return run

    for tag, qe, qres in (("", False, True), ("qepi ", True, True),
                          ("bf16res ", False, False)):
        for mb in mbs:
            dt = timeit(run_q(mb, qe, qres), qp, x)
            print(f"quant {tag}mb{mb}: {BATCH * ITERS / dt:.1f} img/s",
                  flush=True)

    # SEQUENTIAL chains: lax.map over mb-image chunks (each iteration is a
    # small-working-set subprogram) — motivated by bs32 standalone beating
    # every bs128 form on the int8 engine (exp_quant_latency.py)
    from mrla_tpu.serving.quant import _qblocks_head, _quant
    from mrla_tpu.serving.resnet_mrlal import _stem

    def run_seq(qres, mb):
        @jax.jit
        def run(qp, x):
            def fwd(xx):
                y = _stem(xx.astype(qp["stem"]["k"].dtype), qp["stem"])
                yq = _quant(y, qp["inv_a_stem"]) if qres else y
                n = yq.shape[0] // mb
                ych = yq.reshape((n, mb) + yq.shape[1:])
                logits = jax.lax.map(
                    lambda z: _qblocks_head(qp, z, (3, 4, 6, 3), 32, False,
                                            qres),
                    ych,
                )
                return logits.reshape(-1, logits.shape[-1])

            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                return jnp.sum(fwd(xx)[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=ITERS)
            return carry

        return run

    for qres in (True, False):
        for mb in (32, 64):
            dt = timeit(run_seq(qres, mb), qp, x)
            tag = "" if qres else "bf16res "
            print(f"quant {tag}seqchain{mb}: {BATCH * ITERS / dt:.1f} img/s",
                  flush=True)


if __name__ == "__main__":
    main()
