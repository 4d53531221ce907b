#!/usr/bin/env python
"""Detection roofline accounting (VERDICT r2 next-5): XLA cost model bytes
and flops for the COCO-size export program; implied roofline vs measured."""
from __future__ import annotations
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp, numpy as np

H, W = 800, 1344
HBM_GBPS = 819.0
PEAK_TFLOPS = 197.0  # v5e bf16

def main():
    jax.config.update("jax_compilation_cache_dir",
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
    from mrla_tpu.detect.configs import PRESETS, build_backbone_fpn
    p = PRESETS["faster_rcnn_r50mrlal_fpn_1x_coco"]
    for B in (8, 16):
        model = build_backbone_fpn(p.name, dtype=jnp.bfloat16)
        variables = jax.jit(lambda r, x: model.init(r, x, train=False))(
            jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32))
        fwd = jax.jit(lambda v, x: model.apply(v, x, train=False))
        compiled = fwd.lower(variables, jnp.zeros((B, H, W, 3), jnp.bfloat16)).compile()
        ca = compiled.cost_analysis()
        by = ca.get("bytes accessed", 0.0); fl = ca.get("flops", 0.0)
        bw_ms = by/1e9/HBM_GBPS*1e3
        fl_ms = fl/1e12/PEAK_TFLOPS*1e3
        print(f"bs{B}: cost-model bytes {by/1e9:.2f} GB -> bw-roofline {bw_ms:.1f} ms "
              f"({B/bw_ms*1e3:.0f} img/s); flops {fl/1e12:.2f} TF -> mxu-roofline "
              f"{fl_ms:.1f} ms ({B/fl_ms*1e3:.0f} img/s)", flush=True)
        if B == 16:
            import time
            x = jax.device_put(jnp.asarray(
                np.random.default_rng(0).standard_normal((B, H, W, 3)), jnp.bfloat16))
            @jax.jit
            def run_many(v, x):
                def body(c, _):
                    xx = x + (c*1e-20).astype(x.dtype)
                    feats = model.apply(v, xx, train=False)
                    return sum(jnp.sum(f[:,0,0,0].astype(jnp.float32)) for f in feats), None
                c, _ = jax.lax.scan(body, jnp.float32(0), None, length=20)
                return c
            float(run_many(variables, x))
            ts = []
            for _ in range(3):
                t0 = time.perf_counter(); float(run_many(variables, x)); ts.append(time.perf_counter()-t0)
            print(f"bs16 flax measured: {B*20/min(ts):.1f} img/s", flush=True)

if __name__ == "__main__":
    main()
