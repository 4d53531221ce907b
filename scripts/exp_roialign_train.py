#!/usr/bin/env python
"""Faster R-CNN TRAIN step with the differentiable patch-DMA RoIAlign
(round-5 VERDICT item 2).

Round 4 left training on the XLA gather at sr=2 (the pallas kernel had
no VJP), deviating from the presets' pinned sampling_ratio=0
(faster_rcnn_r50mrlal_fpn.py:40) because exact sr=0 through the XLA
path costs ~13.6x.  The round-5 custom VJP (kernels/roialign_patch.py:
_bwd_kernel) makes the pallas backend legal in training; this measures
the full train step (fwd + assign/sample + loss + bwd + SGD) at the
reference contract (bs8, 800x1344, bf16) for backend x sr:

    xla    sr=2   (the round-3/4 default: 31.5 img/s ledger row)
    xla    sr=0   (reference-exact, unusably slow — the motivation)
    pallas sr=2
    pallas sr=0   (reference-exact at Pallas speed — the new default)

plus an on-chip gradient parity check pallas-vs-xla at sr=2.

Usage: exp_roialign_train.py [backends_srs...] e.g. "xla:2 pallas:0"
(default all four).  Honest harness: input perturbed inside the scan.
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

from mrla_tpu.utils.compile_cache import enable_compile_cache

enable_compile_cache()

B, H, W = 8, 800, 1344
G = 32
ITERS = 10


def make_batch(rng):
    x = rng.standard_normal((B, H, W, 3)).astype(np.float32)
    gt_boxes = np.zeros((B, G, 4), np.float32)
    gt_labels = np.zeros((B, G), np.int32)
    gt_valid = np.zeros((B, G), bool)
    for b in range(B):
        n = rng.integers(3, 12)
        x1 = rng.uniform(0, W - 80, n)
        y1 = rng.uniform(0, H - 80, n)
        w = rng.uniform(20, 300, n)
        h = rng.uniform(20, 300, n)
        gt_boxes[b, :n] = np.stack(
            [x1, y1, np.minimum(x1 + w, W), np.minimum(y1 + h, H)], -1)
        gt_labels[b, :n] = rng.integers(0, 80, n)
        gt_valid[b, :n] = True
    return (jnp.asarray(x), jnp.asarray(gt_boxes), jnp.asarray(gt_labels),
            jnp.asarray(gt_valid))


def build_step(backend, sr):
    from mrla_tpu.detect.two_stage import FasterRCNN, init_detector
    from mrla_tpu.detect.two_stage_train import faster_rcnn_train_loss

    model = FasterRCNN(layers=(3, 4, 6, 3), dtype=jnp.bfloat16,
                       num_proposals=1000, roi_sampling_ratio=sr,
                       roi_backend=backend)
    variables = jax.jit(lambda r, xx: init_detector(model, r, xx))(
        jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    params, bs = variables["params"], variables.get("batch_stats", {})
    tx = optax.sgd(0.02, momentum=0.9)
    opt_state = tx.init(params)

    def loss_fn(p, batch, key):
        total, losses, _ = faster_rcnn_train_loss(
            model, {"params": p, "batch_stats": bs},
            batch[0], batch[1], batch[2], batch[3], key,
            train=False,  # norm_eval preset contract
        )
        return total, losses

    @jax.jit
    def step(p, opt_state, batch, key):
        (total, losses), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(p, batch, key)
        updates, opt_state = tx.update(grads, opt_state, p)
        p = optax.apply_updates(p, updates)
        return p, opt_state, total

    return model, params, bs, opt_state, step, loss_fn


def bench(name, step, params, opt_state, batch):
    @jax.jit
    def run(p, o, batch):
        def body(carry, _):
            p, o = carry
            b = (batch[0] + jnp.float32(1e-20) * batch[0][0, 0, 0, 0],
                 batch[1], batch[2], batch[3])
            p, o, total = step_inner(p, o, b, jax.random.key(0))
            return (p, o), total

        (p, o), totals = jax.lax.scan(body, (p, o), None, length=ITERS)
        return totals[-1]

    step_inner = step
    float(run(params, opt_state, batch))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run(params, opt_state, batch))
        times.append(time.perf_counter() - t0)
    dt = min(times) / ITERS
    print(f"  {name}: {dt * 1e3:.1f} ms/step = {B / dt:.1f} img/s",
          flush=True)
    return dt


def main():
    want = sys.argv[1:] or ["xla:2", "pallas:2", "pallas:0", "xla:0"]
    rng = np.random.default_rng(0)
    batch = make_batch(rng)

    print(f"faster_rcnn train step, bs{B} {H}x{W} bf16 SGD, "
          f"input-perturbed x{ITERS}:", flush=True)

    # on-chip gradient parity first (pallas vs xla at the SAME sr=2 grid).
    # Rigorous fp32 per-element parity is already asserted on CPU
    # (tests/test_roialign_patch.py::test_grad_matches_xla_gather); this
    # is the bf16 on-chip sanity: global cosine + relative L2 (a per-leaf
    # max-ratio metric amplifies bf16 noise on near-zero leaves).
    if not os.environ.get("SKIP_PARITY"):
        print("gradient parity pallas-vs-xla (sr=2)...", flush=True)
        _, p_x, bs_x, _, _, loss_x = build_step("xla", 2)
        _, _, _, _, _, loss_p = build_step("pallas", 2)

        @jax.jit
        def parity(p, batch):
            ga = jax.grad(lambda q: loss_x(q, batch,
                                           jax.random.key(1))[0])(p)
            gb = jax.grad(lambda q: loss_p(q, batch,
                                           jax.random.key(1))[0])(p)
            fa = jnp.concatenate([
                g.astype(jnp.float32).ravel() for g in jax.tree.leaves(ga)
            ])
            fb = jnp.concatenate([
                g.astype(jnp.float32).ravel() for g in jax.tree.leaves(gb)
            ])
            cos = jnp.vdot(fa, fb) / (
                jnp.linalg.norm(fa) * jnp.linalg.norm(fb) + 1e-30)
            rel = jnp.linalg.norm(fa - fb) / (jnp.linalg.norm(fa) + 1e-30)
            return cos, rel

        # smaller canvas for the twin fwd+bwd program (one jit holds both
        # backends' activation sets; full bs8 800x1344 would OOM)
        rng_p = np.random.default_rng(7)
        small = (
            jnp.asarray(rng_p.standard_normal((2, 448, 704, 3)),
                        jnp.float32),
            batch[1][:2] * 0.5, batch[2][:2], batch[3][:2],
        )
        cos, rel = parity(p_x, small)
        print(f"  grad cosine {float(cos):.6f}, relative L2 "
              f"{float(rel):.2e}", flush=True)
        del p_x, bs_x, loss_x, loss_p
        parity.clear_cache()

    for spec in want:
        backend, sr = spec.split(":")
        sr = int(sr)
        _, params, bs, opt_state, step, _ = build_step(backend, sr)
        bench(f"{backend} sr={sr}", step, params, opt_state, batch)
        del params, bs, opt_state, step


if __name__ == "__main__":
    main()
