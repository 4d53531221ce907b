#!/usr/bin/env python
"""Secondary serving bench rows on the real chip: mrlab + DeiT engines,
with a microbatch sweep for each.

Same methodology as bench.py: ITERS forwards inside one jitted lax.scan
with a carried scalar threaded through a tiny param perturbation and a
consumption of EVERY chain's output (so no chain is dead-code eliminated);
one dispatch + one fetch per measurement.

Usage: python scripts/bench_misc.py [mrlab|deit|all] [mb0 mb1 ...]
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
ITERS = 100


def timeit(run_many, *args):
    float(run_many(*args))  # compile + warmup
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_many(*args))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return BATCH * ITERS / dt


def bench_mrlab(microbatches):
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import (
        prepare_mrlab_inference_params, resnet_mrlab_forward,
    )

    model = create_model("resnet50_mrlab")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    sp = prepare_mrlab_inference_params(
        jax.device_get(variables), dtype=jnp.bfloat16
    )
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
            jnp.bfloat16,
        )
    )

    for mb in microbatches:
        for use_scan in (False, True):
            @jax.jit
            def run_many(sp, x, mb=mb, use_scan=use_scan):
                def body(carry, _):
                    # perturb the INPUT so nothing is loop-invariant (see
                    # exp_benchperturb.py: param-leaf perturbation lets XLA
                    # hoist the constant-input prefix out of the scan)
                    xx = x + (carry * 1e-20).astype(x.dtype)
                    logits = resnet_mrlab_forward(sp, xx, microbatch=mb,
                                                  use_scan=use_scan)
                    return jnp.sum(logits[:, 0]).astype(jnp.float32), None

                carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                        length=ITERS)
                return carry

            print(f"mrlab mb={mb} scan={use_scan}: "
                  f"{timeit(run_many, sp, x):.1f} img/s", flush=True)


def bench_deit(microbatches, arch="deit_mrlal_small_patch16_224"):
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import deit_forward, prepare_deit_inference_params

    model32 = create_model(arch)
    variables = jax.jit(lambda r, x: model32.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    model, cast = prepare_deit_inference_params(
        arch, jax.device_get(variables)
    )
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
            jnp.bfloat16,
        )
    )

    for mb in microbatches:
        @jax.jit
        def run_many(cast, x, mb=mb):
            def body(carry, _):
                # perturb the INPUT by carry*1e-20 so the ENTIRE network is
                # iteration-dependent: perturbing a single param leaf lets
                # XLA hoist everything upstream of that leaf out of the scan
                # (loop-invariant code motion — measured 229k "img/s" on
                # efficientnet_mrlal_b0 with a late-layer leaf perturbed)
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = deit_forward(model, cast, xx, microbatch=mb)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
            return carry

        print(f"{arch} mb={mb}: {timeit(run_many, cast, x):.1f} img/s",
              flush=True)


def bench_mrlal101(microbatches):
    from mrla_tpu.models import create_model
    from mrla_tpu.serving import (
        prepare_inference_params, resnet_mrlal_forward,
    )

    layers = (3, 4, 23, 3)
    model = create_model("resnet101_mrlal")
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, 224, 224, 3), jnp.float32)
    )
    sp = prepare_inference_params(jax.device_get(variables), layers=layers,
                                  dtype=jnp.bfloat16)
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((BATCH, 224, 224, 3)),
            jnp.bfloat16,
        )
    )

    for mb in microbatches:
        @jax.jit
        def run_many(sp, x, mb=mb):
            def body(carry, _):
                # input perturbation — honest harness (exp_benchperturb.py)
                xx = x + (carry * 1e-20).astype(x.dtype)
                logits = resnet_mrlal_forward(sp, xx, layers=layers,
                                              microbatch=mb)
                return jnp.sum(logits[:, 0]).astype(jnp.float32), None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=ITERS)
            return carry

        print(f"resnet101_mrlal mb={mb}: {timeit(run_many, sp, x):.1f} img/s",
              flush=True)


def bench_detect(preset="faster_rcnn_r50mrlal_fpn_1x_coco"):
    """Backbone+FPN feature export at the COCO eval size (1333x800 padded
    to 1344x800 for /32 divisibility), bs8 bf16 — the mmdet inference
    contract (SURVEY §3.5)."""
    from mrla_tpu.detect.configs import build_backbone_fpn

    B, H, W = 8, 800, 1344
    iters = 40
    model = build_backbone_fpn(preset, dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False)
    )(jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32))
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((B, H, W, 3)),
            jnp.bfloat16,
        )
    )

    @jax.jit
    def run_many(v, x):
        def body(carry, _):
            xx = x + (carry * 1e-20).astype(x.dtype)
            feats = model.apply(v, xx, train=False)
            s = sum(jnp.sum(f[:, 0, 0, 0].astype(jnp.float32)) for f in feats)
            return s, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    float(run_many(variables, x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_many(variables, x))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(f"{preset} (bs{B} {H}x{W} bf16): {B * iters / dt:.1f} img/s",
          flush=True)


def bench_detect_serving(preset="faster_rcnn_r50mrlal_fpn_1x_coco",
                         microbatches=(0, 1, 2, 4)):
    """Optimized detection export (serving/detect.py: BN-folded trunk +
    bf16 FPN) with a microbatch sweep, same COCO-size harness as
    bench_detect."""
    from mrla_tpu.detect.configs import PRESETS, build_backbone_fpn
    from mrla_tpu.serving import detect_forward, prepare_detect_params

    p = PRESETS[preset]
    B, H, W = 8, 800, 1344
    iters = 40
    model = build_backbone_fpn(preset)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False)
    )(jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32))
    sp = prepare_detect_params(
        jax.device_get(variables), layers=tuple(p.backbone_layers),
        dtype=jnp.bfloat16,
    )
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((B, H, W, 3)),
            jnp.bfloat16,
        )
    )

    for mb in microbatches:
        @jax.jit
        def run_many(sp, x, mb=mb):
            def body(carry, _):
                xx = x + (carry * 1e-20).astype(x.dtype)
                feats = detect_forward(
                    sp, xx, layers=tuple(p.backbone_layers),
                    num_outs=p.num_outs, start_level=p.start_level,
                    add_extra_convs=p.add_extra_convs, microbatch=mb,
                )
                s = sum(
                    jnp.sum(f[:, 0, 0, 0].astype(jnp.float32)) for f in feats
                )
                return s, None

            carry, _ = jax.lax.scan(body, jnp.float32(0.0), None,
                                    length=iters)
            return carry

        float(run_many(sp, x))
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_many(sp, x))
            times.append(time.perf_counter() - t0)
        dt = min(times)
        print(f"{preset} SERVING mb={mb} (bs{B} {H}x{W} bf16): "
              f"{B * iters / dt:.1f} img/s", flush=True)


def bench_retinanet_e2e(B=8, H=800, W=1344, iters=20):
    """FULL RetinaNet at the COCO eval size: backbone+FPN+head+decode+NMS
    in ONE jitted program (input-perturbed honest scan).  Comparing with
    the export-only `detect` row isolates the head+NMS cost."""
    from mrla_tpu.detect.retinanet import RetinaNet, get_bboxes

    model = RetinaNet(layers=(3, 4, 6, 3), dtype=jnp.bfloat16)
    variables = jax.jit(
        lambda r, x: model.init(r, x, train=False)
    )(jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32))
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((B, H, W, 3)),
            jnp.bfloat16,
        )
    )

    @jax.jit
    def run_many(v, x):
        def body(carry, _):
            xx = x + (carry * 1e-20).astype(x.dtype)
            outs = model.apply(v, xx, train=False)
            boxes, scores, labels, valid = get_bboxes(
                outs, img_shape=(H, W)
            )
            s = (
                jnp.sum(boxes[:, 0].astype(jnp.float32))
                + jnp.sum(scores[:, 0])
            )
            return s, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    float(run_many(variables, x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_many(variables, x))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(
        f"retinanet_r50mrlal e2e (bs{B} {H}x{W} bf16, nms_pre1000 "
        f"max100): {B * iters / dt:.1f} img/s",
        flush=True,
    )


def bench_faster_rcnn_e2e(B=8, H=800, W=1344, iters=10, proposals=1000):
    """FULL Faster R-CNN at COCO size: RPN proposals (1000-iteration NMS,
    the mmdet test_cfg), RoIAlign, bbox head, second-stage decode+NMS."""
    from mrla_tpu.detect.two_stage import (
        FasterRCNN, init_detector, rcnn_detections,
    )

    model = FasterRCNN(
        layers=(3, 4, 6, 3), dtype=jnp.bfloat16, num_proposals=proposals
    )
    variables = jax.jit(
        lambda r, x: init_detector(model, r, x)
    )(jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32))
    x = jax.device_put(
        jnp.asarray(
            np.random.default_rng(0).standard_normal((B, H, W, 3)),
            jnp.bfloat16,
        )
    )

    @jax.jit
    def run_many(v, x):
        def body(carry, _):
            xx = x + (carry * 1e-20).astype(x.dtype)
            out = model.apply(v, xx, train=False)
            boxes, scores, labels, valid = rcnn_detections(
                out["proposals"], out["proposal_valid"], out["cls"],
                out["reg"], img_shape=(H, W),
            )
            s = (
                jnp.sum(boxes[:, 0].astype(jnp.float32))
                + jnp.sum(scores[:, 0])
            )
            return s, None

        carry, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return carry

    float(run_many(variables, x))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_many(variables, x))
        times.append(time.perf_counter() - t0)
    dt = min(times)
    print(
        f"faster_rcnn_r50mrlal e2e (bs{B} {H}x{W} bf16, {proposals} "
        f"proposals): {B * iters / dt:.1f} img/s",
        flush=True,
    )


def bench_loader(n=512, size=224):
    """Host input pipeline: native C++ libjpeg batch decoder vs PIL, img/s
    (the BASELINE.json jpeg-decode-path requirement)."""
    import tempfile

    from PIL import Image

    from mrla_tpu.data import native

    rng = np.random.default_rng(0)
    with tempfile.TemporaryDirectory() as d:
        paths = []
        for i in range(n):
            arr = rng.integers(0, 255, (384, 512, 3), dtype=np.uint8)
            p = os.path.join(d, f"{i}.jpg")
            Image.fromarray(arr).save(p, quality=90)
            paths.append(p)

        if native.available():
            native.decode_batch(paths[:8], size, train=False, seed=0)  # warm
            t0 = time.perf_counter()
            native.decode_batch(paths, size, train=False, seed=0)
            dt = time.perf_counter() - t0
            print(f"native loader ({n} jpegs -> {size}px): {n / dt:.0f} img/s",
                  flush=True)
        else:
            print("native loader unavailable", flush=True)

        t0 = time.perf_counter()
        for p in paths:
            im = Image.open(p).convert("RGB")
            im = im.resize((size, size), Image.BILINEAR)
            np.asarray(im)
        dt = time.perf_counter() - t0
        print(f"PIL single-thread baseline: {n / dt:.0f} img/s", flush=True)


if __name__ == "__main__":
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    mbs = [int(a) for a in sys.argv[2:]] or [0, 16, 32]
    if what in ("mrlab", "all"):
        bench_mrlab(mbs)
    if what in ("deit", "all"):
        bench_deit(mbs)
    if what in ("zoo",):
        # rest-of-zoo serving rows through the generic precast engine
        for arch in ("efficientnet_mrlal_b0", "resmlp_24", "patchconvnet_s60"):
            bench_deit(mbs, arch=arch)
    if what in ("zoo2",):
        # remaining families, unsplit program (mb0 is the shipped precast
        # default for non-DeiT archs — chains lose without a GAP barrier)
        for arch in (
            "resnet50", "resnet50_eca", "resnext50_32x4d",
            "resnet50_dw", "resnet50_la_eq4", "resnet50_mrlab22",
            "deit_tiny_patch16_224", "deit_mrlab_small_patch16_224",
        ):
            bench_deit(mbs, arch=arch)
    if what in ("mrlal101",):
        bench_mrlal101(mbs)
    if what in ("detect", "all"):
        bench_detect()
    if what in ("detect_serving",):
        bench_detect_serving(microbatches=tuple(mbs) if sys.argv[2:] else (0, 1, 2, 4))
    if what in ("retinanet_e2e",):
        bench_retinanet_e2e()
    if what in ("faster_rcnn_e2e",):
        bench_faster_rcnn_e2e(
            proposals=int(sys.argv[2]) if sys.argv[2:] else 1000
        )
    if what in ("loader",):
        bench_loader()
