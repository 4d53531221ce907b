#!/usr/bin/env python
"""RoIAlign micro-bench at the COCO working point (8 images x 1000 rois,
7x7 out, sr=2): isolate the gather strategy.

Variants: (a) shipped vmapped fp32, (b) vmapped bf16 gather, (c) single
fused gather — batch folded into the flat index space (no vmap batch
dims), fp32 and bf16."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

B, P, C = 8, 1000, 256
SIZES = [(200, 336), (100, 168), (50, 84), (25, 42)]
STRIDES = (4, 8, 16, 32)
ITERS = 20


def timeit(fn, *args):
    jax.tree.map(lambda a: a.block_until_ready(), fn(*args))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        c = fn(*args)
        jax.tree.map(lambda a: a.block_until_ready(), c)
        times.append(time.perf_counter() - t0)
    return min(times) / ITERS


def main():
    from mrla_tpu.detect.roi_align import batched_roi_align

    rng = np.random.default_rng(0)
    feats32 = [
        jnp.asarray(rng.standard_normal((B, h, w, C)), jnp.float32)
        for h, w in SIZES
    ]
    feats16 = [f.astype(jnp.bfloat16) for f in feats32]
    xy = rng.uniform(0, 400, (B, P, 2))
    wh = rng.uniform(20, 350, (B, P, 2))
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1), jnp.float32)
    valid = jnp.ones((B, P), bool)

    @jax.jit
    def run(feats, rois):
        def body(carry, _):
            rr = rois + carry * 1e-20
            out = batched_roi_align(
                list(feats), rr, valid, strides=STRIDES, out_size=7
            )
            return jnp.sum(out[:, 0, 0, 0].astype(jnp.float32)), None

        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=ITERS)
        return c

    if "--baseline" in sys.argv:
        for name, feats in [("fp32", feats32), ("bf16", feats16)]:
            dt = timeit(run, tuple(feats), rois)
            print(f"vmapped {name}: {dt*1e3:.2f} ms/iter", flush=True)

    # ---- variant: row-pair lax.gather, batch folded into index space
    from mrla_tpu.detect.roi_align import (
        _axis_weights, _sample_coords, map_roi_levels,
    )
    from jax import lax

    heights = np.array([h for h, w in SIZES], np.int32)
    widths = np.array([w for h, w in SIZES], np.int32)
    offsets = np.concatenate(
        [[0], np.cumsum(heights * widths)[:-1]]
    ).astype(np.int32)
    sum_hw = int((heights * widths).sum())

    def pair_align(feats, rois, out_size=7, sr=2):
        c = feats[0].shape[-1]
        flat = jnp.concatenate(
            [f.reshape(B, -1, c) for f in feats], axis=1
        ).reshape(B * sum_hw, c)

        def coords(rois_one):  # per image
            lvl = map_roi_levels(rois_one, len(SIZES))
            stride = jnp.asarray(np.asarray(STRIDES, np.float32))[lvl]
            h_l = jnp.asarray(heights)[lvl]
            w_l = jnp.asarray(widths)[lvl]
            off = jnp.asarray(offsets)[lvl]
            sc = 1.0 / stride
            x1 = rois_one[:, 0] * sc - 0.5
            y1 = rois_one[:, 1] * sc - 0.5
            x2 = rois_one[:, 2] * sc - 0.5
            y2 = rois_one[:, 3] * sc - 0.5
            ys = _sample_coords(y1, y2, out_size, sr)
            xs = _sample_coords(x1, x2, out_size, sr)
            y_lo, y_hi, wy_lo, wy_hi, y_ok = _axis_weights(ys, h_l[:, None])
            x_lo, _, wx_lo, wx_hi, x_ok = _axis_weights(xs, w_l[:, None])
            wy_lo = jnp.where(y_ok, wy_lo, 0.0)
            wy_hi = jnp.where(y_ok, wy_hi, 0.0)
            wx_lo = jnp.where(x_ok, wx_lo, 0.0)
            wx_hi = jnp.where(x_ok, wx_hi, 0.0)
            base_lo = off[:, None, None] + y_lo[:, :, None] * w_l[
                :, None, None
            ] + x_lo[:, None, :]
            base_hi = off[:, None, None] + y_hi[:, :, None] * w_l[
                :, None, None
            ] + x_lo[:, None, :]
            return base_lo, base_hi, wy_lo, wy_hi, wx_lo, wx_hi

        base_lo, base_hi, wy_lo, wy_hi, wx_lo, wx_hi = jax.vmap(coords)(
            rois
        )
        img_off = (jnp.arange(B, dtype=jnp.int32) * sum_hw)[
            :, None, None, None
        ]
        dn = lax.GatherDimensionNumbers(
            offset_dims=(1, 2), collapsed_slice_dims=(),
            start_index_map=(0,),
        )

        def pairs(idx):  # [M] -> [M, 2, C]
            return lax.gather(
                flat, idx[:, None], dn, slice_sizes=(2, c),
                mode=lax.GatherScatterMode.CLIP,
            )

        s = out_size * sr
        idx_lo = (base_lo + img_off).reshape(B * P, s, s)
        idx_hi = (base_hi + img_off).reshape(B * P, s, s)
        args = (
            idx_lo, idx_hi,
            wy_lo.reshape(B * P, s), wy_hi.reshape(B * P, s),
            wx_lo.reshape(B * P, s), wx_hi.reshape(B * P, s),
        )

        def chunk(a):
            ilo, ihi, wyl, wyh, wxl, wxh = a  # [K, s, s], [K, s] ...
            k = ilo.shape[0]
            lo = pairs(ilo.reshape(-1)).reshape(k, s, s, 2, c)
            hi = pairs(ihi.reshape(-1)).reshape(k, s, s, 2, c)
            wx_l = wxl[:, None, :, None]
            wx_h = wxh[:, None, :, None]
            row_lo = lo[..., 0, :] * wx_l + lo[..., 1, :] * wx_h
            row_hi = hi[..., 0, :] * wx_l + hi[..., 1, :] * wx_h
            acc = (
                row_lo * wyl[:, :, None, None]
                + row_hi * wyh[:, :, None, None]
            )
            acc = acc.reshape(k, out_size, sr, out_size, sr, c)
            return acc.mean(axis=(2, 4))

        n_chunks = 16
        k = B * P // n_chunks
        args_c = jax.tree.map(
            lambda a: a.reshape((n_chunks, k) + a.shape[1:]), args
        )
        out = lax.map(chunk, args_c)  # [n_chunks, k, out, out, c]
        return out.reshape(B, P, out_size, out_size, c)

    # numerics vs shipped first
    ref = batched_roi_align(feats32, rois, valid, strides=STRIDES,
                            out_size=7)
    got = pair_align(feats32, rois)
    err = float(jnp.max(jnp.abs(ref - got)))
    print(f"pair-gather max|diff| vs shipped: {err:.2e}", flush=True)

    # scan-wrapped forms of this gather fault the TPU compiler (same bug
    # class as detect fwd+decode fusion); time by per-call VALUE FETCH —
    # reading the scalar to host forces completion, so this cannot
    # under-report the way bare block_until_ready can through axon.
    @jax.jit
    def one_pair(feats, rois, eps):
        out = pair_align(list(feats), rois + eps * 1e-20)
        return jnp.sum(out[:, 0, 0, 0].astype(jnp.float32))

    @jax.jit
    def one_vmapped(feats, rois, eps):
        out = batched_roi_align(
            list(feats), rois + eps * 1e-20, valid,
            strides=STRIDES, out_size=7,
        )
        return jnp.sum(out[:, 0, 0, 0].astype(jnp.float32))

    @jax.jit
    def one_sr1(feats, rois, eps):
        out = batched_roi_align(
            list(feats), rois + eps * 1e-20, valid,
            strides=STRIDES, out_size=7, sampling_ratio=1,
        )
        return jnp.sum(out[:, 0, 0, 0].astype(jnp.float32))

    def flat_take_align(feats, rois, out_size=7, sr=2):
        """4-corner jnp.take, batch folded into ONE flat axis."""
        c = feats[0].shape[-1]
        flat = jnp.concatenate(
            [f.reshape(B, -1, c) for f in feats], axis=1
        ).reshape(B * sum_hw, c)

        def coords(rois_one):
            lvl = map_roi_levels(rois_one, len(SIZES))
            stride = jnp.asarray(np.asarray(STRIDES, np.float32))[lvl]
            h_l = jnp.asarray(heights)[lvl]
            w_l = jnp.asarray(widths)[lvl]
            off = jnp.asarray(offsets)[lvl]
            sc = 1.0 / stride
            x1 = rois_one[:, 0] * sc - 0.5
            y1 = rois_one[:, 1] * sc - 0.5
            x2 = rois_one[:, 2] * sc - 0.5
            y2 = rois_one[:, 3] * sc - 0.5
            ys = _sample_coords(y1, y2, out_size, sr)
            xs = _sample_coords(x1, x2, out_size, sr)
            y_lo, y_hi, wy_lo, wy_hi, y_ok = _axis_weights(ys, h_l[:, None])
            x_lo, x_hi, wx_lo, wx_hi, x_ok = _axis_weights(xs, w_l[:, None])
            wy_lo = jnp.where(y_ok, wy_lo, 0.0)
            wy_hi = jnp.where(y_ok, wy_hi, 0.0)
            wx_lo = jnp.where(x_ok, wx_lo, 0.0)
            wx_hi = jnp.where(x_ok, wx_hi, 0.0)
            return off, w_l, y_lo, y_hi, x_lo, x_hi, wy_lo, wy_hi, wx_lo, wx_hi

        off, w_l, y_lo, y_hi, x_lo, x_hi, wy_lo, wy_hi, wx_lo, wx_hi = (
            jax.vmap(coords)(rois)
        )
        img_off = (jnp.arange(B, dtype=jnp.int32) * sum_hw)[:, None]
        base = off + img_off  # [B, P]

        def corner(yi, xi, wy, wx):
            idx = (
                base[:, :, None, None]
                + yi[:, :, :, None] * w_l[:, :, None, None]
                + xi[:, :, None, :]
            )  # [B, P, S, S]
            vals = jnp.take(flat, idx.reshape(-1), axis=0).reshape(
                idx.shape + (c,)
            )
            return vals * (
                wy[:, :, :, None] * wx[:, :, None, :]
            )[..., None]

        acc = (
            corner(y_lo, x_lo, wy_lo, wx_lo)
            + corner(y_lo, x_hi, wy_lo, wx_hi)
            + corner(y_hi, x_lo, wy_hi, wx_lo)
            + corner(y_hi, x_hi, wy_hi, wx_hi)
        )
        s = out_size
        acc = acc.reshape(B, P, s, sr, s, sr, c)
        return acc.mean(axis=(3, 5))

    gotf = flat_take_align(feats32, rois)
    print("flat-take max|diff| vs shipped:",
          float(jnp.max(jnp.abs(ref - gotf))), flush=True)

    @jax.jit
    def one_flat(feats, rois, eps):
        out = flat_take_align(list(feats), rois + eps * 1e-20)
        return jnp.sum(out[:, 0, 0, 0].astype(jnp.float32))

    for label, fn in [
        ("vmapped sr2", one_vmapped),
        ("vmapped sr1", one_sr1),
        ("flat-take sr2", one_flat),
        ("pair-gather", one_pair),
    ]:
        if label == "pair-gather" and "--pair" not in sys.argv:
            continue  # measured: 4.1 s/call — lax.gather slice lowering
        for name, feats in [("fp32", feats32), ("bf16", feats16)]:
            float(fn(tuple(feats), rois, jnp.float32(0.0)))
            times = []
            for i in range(6):
                t0 = time.perf_counter()
                float(fn(tuple(feats), rois, jnp.float32(i)))
                times.append(time.perf_counter() - t0)
            print(f"{label} {name}: {min(times)*1e3:.2f} ms/call "
                  "(incl. 1 dispatch)", flush=True)


if __name__ == "__main__":
    main()
