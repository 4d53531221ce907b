#!/usr/bin/env python
"""Detection serving decomposition: flax baseline re-check, folded trunk
with/without the space-to-depth stem, and backbone-only vs +FPN cost."""
from __future__ import annotations
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

B, H, W = 8, 800, 1344
ITERS = 40

def timeit(run_many, *args):
    float(run_many(*args))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); float(run_many(*args)); ts.append(time.perf_counter()-t0)
    return B*ITERS/min(ts)

def main():
    jax.config.update("jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 10.0)
    from mrla_tpu.detect.configs import PRESETS, build_backbone_fpn
    from mrla_tpu.serving import detect_forward, prepare_detect_params
    from mrla_tpu.serving.resnet_mrlal import _trunk_impl

    p = PRESETS["faster_rcnn_r50mrlal_fpn_1x_coco"]
    model = build_backbone_fpn(p.name, dtype=jnp.bfloat16)
    variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
        jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32))
    sp = prepare_detect_params(jax.device_get(variables),
                               layers=tuple(p.backbone_layers), dtype=jnp.bfloat16)
    x = jax.device_put(jnp.asarray(
        np.random.default_rng(0).standard_normal((B, H, W, 3)), jnp.bfloat16))

    which = sys.argv[1:] or ["flax", "nos2d", "trunkonly"]

    if "flax" in which:
        @jax.jit
        def run_flax(v, x):
            def body(c, _):
                xx = x + (c*1e-20).astype(x.dtype)
                feats = model.apply(v, xx, train=False)
                return sum(jnp.sum(f[:,0,0,0].astype(jnp.float32)) for f in feats), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return c
        print(f"flax (round-2 path re-check): {timeit(run_flax, variables, x):.1f} img/s", flush=True)

    if "nos2d" in which:
        sp2 = dict(sp); sp2["trunk"] = dict(sp["trunk"])
        sp2["trunk"]["stem"] = {k: v for k, v in sp["trunk"]["stem"].items() if k != "k_s2d"}
        @jax.jit
        def run_nos2d(sp2, x):
            def body(c, _):
                xx = x + (c*1e-20).astype(x.dtype)
                feats = detect_forward(sp2, xx, layers=tuple(p.backbone_layers),
                                       num_outs=p.num_outs, start_level=p.start_level,
                                       add_extra_convs=p.add_extra_convs, microbatch=0)
                return sum(jnp.sum(f[:,0,0,0].astype(jnp.float32)) for f in feats), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return c
        print(f"serving mb0 NO-s2d stem: {timeit(run_nos2d, sp2, x):.1f} img/s", flush=True)

    if "trunkonly" in which:
        @jax.jit
        def run_trunk(sp, x):
            def body(c, _):
                xx = x + (c*1e-20).astype(x.dtype)
                feats = _trunk_impl(sp["trunk"], xx, tuple(p.backbone_layers), 32, False)
                return sum(jnp.sum(f[:,0,0,0].astype(jnp.float32)) for f in feats), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=ITERS)
            return c
        print(f"serving trunk only (no FPN): {timeit(run_trunk, sp, x):.1f} img/s", flush=True)

if __name__ == "__main__":
    main()
