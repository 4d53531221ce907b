#!/usr/bin/env python
"""Measure the patch-DMA RoIAlign coverage contract on realistic rois
(ADVICE r4 medium #2).

The kernel's static 56-cell patch covers every roi the FPN level mapping
produces at aspect ratio <= 3; wider/thinner canvas-clamped RPN
proposals can exceed the patch along their long axis and lose the
out-of-patch bilinear mass (kernels/roialign_patch.py docstring).  This
quantifies how often that happens and how much mass is lost, on:

  1. the model's OWN RPN proposals (random-init FasterRCNN forward at
     the COCO eval canvas, 800x1344 — the same construction
     exp_roialign_delta.py uses), and
  2. the clamped realistic COCO scale mix.

The out-of-patch mass is computed analytically per roi with the same
sample/bilinear/border rules as the kernel's weight matrices
(_axis_matrix): for each axis, the fraction of total bin-sample weight
that lands on cells outside [p0, p0+patch).  Exactness claims in
PARITY.md cite these numbers.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

B, H, W = 2, 800, 1344
STRIDES = (4, 8, 16, 32)
FINEST = 56.0
OUT = 7


def axis_mass_outside(start, bin_size, g, p0, psize, n_act):
    """Fraction of this axis's total weight on cells outside the patch
    window [p0, p0+psize), under detect/roi_align.py border rules."""
    total = 0.0
    outside = 0.0
    for o in range(OUT):
        for i in range(int(g)):
            t = start + (o + (i + 0.5) / g) * bin_size
            if t < -1.0 or t > n_act:
                continue
            tc = min(max(t, 0.0), n_act - 1.0)
            lo = np.floor(tc)
            hi = min(lo + 1.0, n_act - 1.0)
            w_hi = tc - lo
            for cell, wt in ((lo, (1.0 - w_hi) / g), (hi, w_hi / g)):
                if wt == 0.0:
                    continue
                total += wt
                if cell < p0 or cell >= p0 + psize:
                    outside += wt
    return outside / total if total > 0 else 0.0


def coverage_stats(name, rois, valid, sampling_ratio=0):
    from mrla_tpu.detect.roi_align import default_max_grid, map_roi_levels
    from mrla_tpu.kernels.roialign_patch import PATCH_H, PATCH_W, _round8

    import jax.numpy as jnp

    # FPN level dims at the canvas (ceil-div conv stride arithmetic;
    # (200,336)/(100,168)/(50,84)/(25,42) at 800x1344)
    shapes = [(-(-H // s), -(-W // s)) for s in STRIDES]
    heights = np.array([s[0] for s in shapes])
    widths = np.array([s[1] for s in shapes])
    widths_p = np.array([_round8(int(w)) for w in widths])
    ph_buf = min(PATCH_H, int(heights.max()))
    pw_buf = min(PATCH_W, int(widths_p.max()))
    smax = default_max_grid(shapes, OUT)

    lvl = np.asarray(map_roi_levels(jnp.asarray(rois), 4, FINEST))
    rois = np.asarray(rois, np.float64)
    valid = np.asarray(valid, bool)

    n = 0
    n_out = 0
    masses = []
    aspects = []
    for b in range(rois.shape[0]):
        for p in range(rois.shape[1]):
            if not valid[b, p]:
                continue
            l = int(lvl[b, p])
            stride = STRIDES[l]
            h_l, w_l = float(heights[l]), float(widths[l])
            w_lp = float(widths_p[l])
            x1 = rois[b, p, 0] / stride - 0.5
            y1 = rois[b, p, 1] / stride - 0.5
            x2 = rois[b, p, 2] / stride - 0.5
            y2 = rois[b, p, 3] / stride - 0.5
            bw = max(x2 - x1, 1e-6)
            bh = max(y2 - y1, 1e-6)
            aspects.append(max(bw / bh, bh / bw))
            bin_y, bin_x = bh / OUT, bw / OUT
            if sampling_ratio > 0:
                gy = gx = sampling_ratio
            else:
                gy = int(np.clip(np.ceil(bin_y), 1, smax))
                gx = int(np.clip(np.ceil(bin_x), 1, smax))
            ph_l = min(h_l, float(ph_buf))
            pw_l = min(w_lp, float(pw_buf))
            py0 = np.clip(np.floor(y1), 0.0, max(h_l - ph_l, 0.0))
            px0 = np.clip(np.floor(x1), 0.0, max(w_lp - pw_l, 0.0))
            px0 = np.floor(px0 / 8.0) * 8.0
            my = axis_mass_outside(y1, bin_y, gy, py0, ph_buf, h_l)
            mx = axis_mass_outside(x1, bin_x, gx, px0, pw_buf, w_l)
            m = 1.0 - (1.0 - my) * (1.0 - mx)
            n += 1
            if m > 1e-12:
                n_out += 1
                masses.append(m)

    aspects = np.array(aspects)
    print(f"{name}: {n} valid rois")
    print(f"  aspect ratio: p50 {np.percentile(aspects, 50):.2f}, "
          f"p99 {np.percentile(aspects, 99):.2f}, max {aspects.max():.2f}; "
          f"fraction > 3: {np.mean(aspects > 3) * 100:.3f}%")
    if masses:
        masses = np.array(masses)
        print(f"  rois losing ANY out-of-patch mass: {n_out} "
              f"({n_out / n * 100:.3f}%); among those, lost-mass "
              f"mean {masses.mean() * 100:.2f}% / max {masses.max() * 100:.2f}%")
    else:
        print(f"  rois losing ANY out-of-patch mass: 0 (0.000%)")
    return n, n_out


def main():
    import jax
    import jax.numpy as jnp

    from mrla_tpu.detect.two_stage import FasterRCNN, init_detector

    rng = np.random.default_rng(0)

    # 1. the model's own RPN proposals at the COCO canvas
    model = FasterRCNN(layers=(3, 4, 6, 3), dtype=jnp.float32,
                       num_proposals=1000)
    variables = jax.jit(lambda r, x: init_detector(model, r, x))(
        jax.random.key(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    x = jnp.asarray(rng.standard_normal((B, H, W, 3)), jnp.float32)
    out = jax.jit(lambda v, x: model.apply(v, x, train=False))(variables, x)
    coverage_stats("RPN proposals (random-init model, 800x1344)",
                   np.asarray(out["proposals"]),
                   np.asarray(out["proposal_valid"]))

    # 2. clamped realistic COCO scale mix (exp_roialign_delta.py's)
    p = 1000
    scale = np.exp(rng.uniform(np.log(16.0), np.log(500.0), (B, p)))
    ar = np.exp(rng.uniform(np.log(1 / 3), np.log(3.0), (B, p)))
    w = scale * np.sqrt(ar)
    h = scale / np.sqrt(ar)
    cx = rng.uniform(0, W, (B, p))
    cy = rng.uniform(0, H, (B, p))
    r = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    r = np.clip(r, [0, 0, 0, 0], [W, H, W, H]).astype(np.float32)
    coverage_stats("realistic COCO mix (clamped, aspect<=3 pre-clamp)",
                   r, np.ones((B, p), bool))

    # 3. adversarial: extreme-aspect thin boxes (the failure mode the
    # contract names) — how much mass do they actually lose?
    p = 200
    long = np.exp(rng.uniform(np.log(200.0), np.log(1200.0), (B, p)))
    short = np.exp(rng.uniform(np.log(4.0), np.log(30.0), (B, p)))
    cx = rng.uniform(0, W, (B, p))
    cy = rng.uniform(0, H, (B, p))
    horiz = rng.random((B, p)) > 0.5
    w = np.where(horiz, long, short)
    h = np.where(horiz, short, long)
    r = np.stack([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], -1)
    r = np.clip(r, [0, 0, 0, 0], [W, H, W, H]).astype(np.float32)
    coverage_stats("adversarial thin boxes (aspect 7..300)",
                   r, np.ones((B, p), bool))


if __name__ == "__main__":
    main()
