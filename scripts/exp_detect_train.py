#!/usr/bin/env python
"""Decompose the RetinaNet TRAIN step (bs8 COCO bf16 SGD — the 254 ms /
31.5 img/s ROADMAP row) the way the classification ledger decomposed its
86.4 ms step: knockouts + levers, honest input-perturbed scans with real
optimizer-state updates.

Rows:
  full         — model fwd + assign + focal/L1 + bwd + SGD (the row)
  fwd-only     — loss value only, no grad/opt (fwd share)
  pre-targets  — assignment precomputed OUTSIDE the step (constant
                 targets input): isolates the assigner+target cost
  trunk-only   — dummy L2 head loss (no assign/focal): backbone+FPN+head
                 fwd+bwd share

Usage: python scripts/exp_detect_train.py [iters=10]
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

B, H, W = 8, 800, 1344
NUM_CLASSES = 80
G = 32  # padded gt boxes per image


def timeit(fn, *args):
    # fetch the carried scalar to host — block_until_ready can return
    # early through the axon relay (see bench.py)
    float(fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    return min(times)


def main() -> None:
    from mrla_tpu.detect.anchors import pyramid_anchors
    from mrla_tpu.detect.losses import retinanet_loss, sigmoid_focal_loss
    from mrla_tpu.detect.retinanet import RetinaNet
    from mrla_tpu.detect.targets import anchor_targets

    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 10

    rng = np.random.default_rng(0)
    model = RetinaNet(layers=(3, 4, 6, 3), dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, train=True))(
        jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.sgd(0.01, momentum=0.9)
    opt_state = tx.init(params)

    x = jax.device_put(
        jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.bfloat16)
    )
    # synthetic padded gt: ~8 valid boxes/img
    gb = np.zeros((B, G, 4), np.float32)
    gl = np.zeros((B, G), np.int32)
    gv = np.zeros((B, G), bool)
    for i in range(B):
        n = 8
        x0 = rng.uniform(0, W - 100, n)
        y0 = rng.uniform(0, H - 100, n)
        w_ = rng.uniform(20, 300, n)
        h_ = rng.uniform(20, 300, n)
        gb[i, :n] = np.stack(
            [x0, y0, np.minimum(x0 + w_, W), np.minimum(y0 + h_, H)], -1
        )
        gl[i, :n] = rng.integers(0, NUM_CLASSES, n)
        gv[i, :n] = True
    gb, gl, gv = map(jax.device_put, (jnp.asarray(gb), jnp.asarray(gl),
                                      jnp.asarray(gv)))

    def apply_model(p, bs, xx):
        out, mut = model.apply(
            {"params": p, "batch_stats": bs}, xx, train=True,
            mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    def scan_step(step_fn):
        @jax.jit
        def run(p, bs, opt_state, x):
            def body(carry, _):
                p, bs, opt_state, acc = carry
                xx = x + (acc * 1e-20).astype(x.dtype)
                p, bs, opt_state, loss = step_fn(p, bs, opt_state, xx)
                return (p, bs, opt_state, loss.astype(jnp.float32)), None

            (p, bs, opt_state, acc), _ = jax.lax.scan(
                body, (p, bs, opt_state, jnp.float32(0.0)), None,
                length=iters,
            )
            return acc

        return run

    def full_step(p, bs, opt_state, xx):
        def loss_fn(p):
            out, new_bs = apply_model(p, bs, xx)
            losses = retinanet_loss(out, gb, gl, gv, NUM_CLASSES)
            return losses["loss"], new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_bs, opt_state, loss

    def fwd_only(p, bs, opt_state, xx):
        out, new_bs = apply_model(p, bs, xx)
        losses = retinanet_loss(out, gb, gl, gv, NUM_CLASSES)
        return p, new_bs, opt_state, losses["loss"]

    # precompute targets once outside (featmap sizes are static)
    featmaps = [(H // s + (H % s > 0), W // s + (W % s > 0))
                for s in (8, 16, 32, 64, 128)]
    anchors = jnp.concatenate(
        [jnp.asarray(a) for a in pyramid_anchors(
            featmaps, (8, 16, 32, 64, 128), 4.0, 3, (0.5, 1.0, 2.0))],
        axis=0,
    )
    labels, label_w, bbox_t, bbox_w, num_pos = jax.jit(jax.vmap(
        lambda b_, l_, v_: anchor_targets(
            anchors, b_, l_, v_, NUM_CLASSES, 0.5, 0.4, 0.0,
            (0.0,) * 4, (1.0,) * 4,
        )
    ))(gb, gl, gv)
    targets = jax.device_put(jax.device_get(
        (labels, label_w, bbox_t, bbox_w, num_pos)
    ))

    def pre_target_step(p, bs, opt_state, xx):
        labels, label_w, bbox_t, bbox_w, num_pos = targets

        def loss_fn(p):
            out, new_bs = apply_model(p, bs, xx)
            b = out[0][0].shape[0]
            cls_logits = jnp.concatenate(
                [c.reshape(b, -1, NUM_CLASSES).astype(jnp.float32)
                 for c, _ in out], axis=1)
            bbox_preds = jnp.concatenate(
                [r.reshape(b, -1, 4).astype(jnp.float32) for _, r in out],
                axis=1)
            avg = jnp.maximum(num_pos.sum().astype(jnp.float32), 1.0)
            onehot = jax.nn.one_hot(labels, NUM_CLASSES, dtype=jnp.float32)
            lc = (sigmoid_focal_loss(cls_logits, onehot)
                  * label_w[..., None]).sum() / avg
            lb = (jnp.abs(bbox_preds - bbox_t).sum(-1) * bbox_w).sum() / avg
            return lc + lb, new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_bs, opt_state, loss

    def trunk_step(p, bs, opt_state, xx):
        def loss_fn(p):
            out, new_bs = apply_model(p, bs, xx)
            loss = sum(
                jnp.mean(jnp.square(c.astype(jnp.float32)))
                + jnp.mean(jnp.square(r.astype(jnp.float32)))
                for c, r in out
            )
            return loss, new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_bs, opt_state, loss

    rows = [
        ("full", full_step),
        ("fwd-only", fwd_only),
        ("pre-targets", pre_target_step),
        ("trunk-only", trunk_step),
    ]
    for name, step in rows:
        dt = timeit(scan_step(step), params, stats, opt_state, x)
        ms = dt / iters * 1e3
        print(f"{name}: {ms:.1f} ms/step = {B / (dt / iters):.1f} img/s",
              flush=True)

    # remat lever: classification rejected it at bs128/224 (no memory
    # pressure); COCO-size activations (stage-1 [8,200,336,256] ~ 1.1 GB
    # bf16) might flip the verdict
    model_r = RetinaNet(layers=(3, 4, 6, 3), dtype=jnp.bfloat16, remat=True)

    def apply_remat(p, bs, xx):
        out, mut = model_r.apply(
            {"params": p, "batch_stats": bs}, xx, train=True,
            mutable=["batch_stats"],
        )
        return out, mut["batch_stats"]

    def full_step_remat(p, bs, opt_state, xx):
        def loss_fn(p):
            out, new_bs = apply_remat(p, bs, xx)
            losses = retinanet_loss(out, gb, gl, gv, NUM_CLASSES)
            return losses["loss"], new_bs

        (loss, new_bs), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(p)
        updates, opt_state = tx.update(grads, opt_state, p)
        return optax.apply_updates(p, updates), new_bs, opt_state, loss

    dt = timeit(scan_step(full_step_remat), params, stats, opt_state, x)
    ms = dt / iters * 1e3
    print(f"full+remat: {ms:.1f} ms/step = {B / (dt / iters):.1f} img/s",
          flush=True)


if __name__ == "__main__":
    main()
