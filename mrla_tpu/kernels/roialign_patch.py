"""Patch-DMA RoIAlign: per-roi rectangle DMA + separable-matmul pooling.

Round-3 autopsy (ROADMAP.md "RoIAlign gather autopsy"): the XLA flat-take
gather is row-COUNT-bound — 8x1000 rois x (7·sr)² sample points x 4
bilinear corners ≈ 6.3M gathered rows at sr=2, and the TPU gathers rows
at a fixed rate (~52M rows/s), so cost scales with grid² (sr=0's
adaptive grid pays 13.6x).  This kernel replaces the row gather with the
one idea the autopsy never measured: a DMA per ROI, not per row.

Per roi (one Pallas grid step, double-buffered):

  1. DMA the roi's bounding rectangle ``feats[lvl][b, y0:y0+PH, x0:x0+PW]``
     from HBM into a VMEM patch — per-LEVEL static patch sizes
     (compile-time branch on the roi's FPN level), so the copy is a few
     large contiguous chunks instead of millions of rows;
  2. build the per-axis bilinear+average weight matrices Ay [7, PH],
     Ax [7, PW] on the VPU — each entry folds the sample-slot average
     ``(i<g)/g``, the bilinear hats, and the border rules of
     ``detect/roi_align.py`` (torchvision-aligned semantics).  Because
     the slot sum collapses inside the weight matrix, the ADAPTIVE
     ``sampling_ratio=0`` grid (the reference presets' setting,
     faster_rcnn_r50mrlal_fpn.py:40) costs exactly the same as a static
     grid — the XLA path's smax² scan disappears;
  3. pool with two skinny MXU matmuls (bilinear interpolation is
     separable): ``T = Ay @ patch[PH, PW·C]`` then ``Ax @ T'``.

Coverage contract (same regime as ``default_max_grid``): the static
patch spans ``PATCH=56`` cells per axis, which covers every roi the FPN
level mapping can produce at aspect ratio ≤ 3 (side_cells <
2·56·√3/stride_ratio ≈ 48.5 on unclamped levels; clamped-top-level rois
span at most the level itself, which the per-level patch covers fully).
Wider-aspect rois lose the out-of-patch contributions (weights are
masked to the patch) — the analogous caveat to the XLA path's
``max_grid`` clamp, and exact for canvas-clamped RPN proposals.

Numerics: weights fp32, matmuls accumulate fp32, output cast to the
feature dtype — bitwise-comparable to the XLA path at fp32 inputs (both
sum the same 4-corner contributions, reassociated).
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mrla_tpu.detect.roi_align import default_max_grid, map_roi_levels

PATCH_H = 56  # patch rows; covers aspect<=3 rois on every level
PATCH_W = 64  # patch cols: 56-cell coverage + 8 slack because the DMA
# column start must be 8-aligned (Mosaic tiles HBM (8, 128) over (W, C))


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _axis_matrix(start, bin_size, g, p0, n_act, psize: int,
                 out_size: int, smax: int):
    """Weight matrix [out_size, psize] for one axis of one roi.

    ``start`` roi edge (cells), ``bin_size`` per-bin extent, ``g`` int
    samples/bin, ``p0`` patch origin (cells), ``n_act`` level extent —
    all fp32 scalars.  Entry [o, p] sums, over the ``g`` live sample
    slots of bin ``o``, the bilinear hat weight that sample places on
    absolute cell ``p0 + p`` under detect/roi_align.py's border rules
    (out-of-[-1, n] samples dropped, in-range clamped to [0, n-1]),
    scaled by 1/g.  Columns at ``p0 + p >= n_act`` or ``p >= patch
    extent`` are zero (the patch never holds those cells).
    """
    o = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, smax), 0).astype(jnp.float32)
    i = jax.lax.broadcasted_iota(
        jnp.int32, (out_size, smax), 1).astype(jnp.float32)
    t = start + (o + (i + 0.5) / g) * bin_size  # [O, S] sample coords
    slot_w = jnp.where(i < g, 1.0 / g, 0.0)
    in_range = (t >= -1.0) & (t <= n_act)
    tc = jnp.clip(t, 0.0, n_act - 1.0)
    lo = jnp.floor(tc)
    hi = jnp.minimum(lo + 1.0, n_act - 1.0)
    w_hi = tc - lo
    w_lo = jnp.where(in_range, (1.0 - w_hi) * slot_w, 0.0)
    w_hi = jnp.where(in_range, w_hi * slot_w, 0.0)
    pabs = p0 + jax.lax.broadcasted_iota(
        jnp.int32, (out_size, smax, psize), 2).astype(jnp.float32)
    a = jnp.where(pabs == lo[..., None], w_lo[..., None], 0.0) + \
        jnp.where(pabs == hi[..., None], w_hi[..., None], 0.0)
    a = jnp.where(pabs < n_act, a, 0.0)
    return a.sum(axis=1)  # [O, psize]


def _kernel(
    # scalar prefetch (SMEM)
    lvl_ref, bidx_ref, py0_ref, px0_ref,
    # blocked VMEM inputs
    meta_ref,  # [1, 1, 16] fp32 per-roi metadata
    *rest,
    feats_hw: Sequence[tuple], out_size: int, smax: int,
    ph_buf: int, pw_buf: int,
):
    num_levels = len(feats_hw)
    feat_refs = rest[:num_levels]
    out_ref = rest[num_levels]
    patch, sems = rest[num_levels + 1], rest[num_levels + 2]
    r = pl.program_id(0)
    n = pl.num_programs(0)
    c = out_ref.shape[-1]

    def dma(rr, slot):
        # one true branch: the roi's level — per-level STATIC patch dims
        for l, (h_l, w_l) in enumerate(feats_hw):
            ph, pw = min(ph_buf, h_l), min(pw_buf, w_l)

            @pl.when(lvl_ref[rr] == l)
            def _(l=l, ph=ph, pw=pw):
                pltpu.make_async_copy(
                    feat_refs[l].at[
                        bidx_ref[rr],
                        pl.ds(py0_ref[rr], ph),
                        pl.ds(pl.multiple_of(px0_ref[rr], 8), pw),
                        :,
                    ],
                    patch.at[slot, 0:ph, 0:pw, :],
                    sems.at[slot],
                ).start()

    @pl.when(r == 0)
    def _():
        # stale-slot hygiene: masked weights multiply whatever sits in
        # the un-DMA'd pad region; zero once so it is never NaN bits
        patch[...] = jnp.zeros(patch.shape, patch.dtype)
        dma(0, 0)

    @pl.when(r + 1 < n)
    def _():
        dma(r + 1, (r + 1) % 2)

    slot = r % 2
    # the wait must match the DMA'd byte count, which is per-level
    for l, (h_l, w_l) in enumerate(feats_hw):
        ph, pw = min(ph_buf, h_l), min(pw_buf, w_l)

        @pl.when(lvl_ref[r] == l)
        def _(ph=ph, pw=pw):
            pltpu.make_async_copy(
                patch.at[slot, 0:ph, 0:pw, :],
                patch.at[slot, 0:ph, 0:pw, :],
                sems.at[slot],
            ).wait()

    m = meta_ref[0, 0]
    ay = _axis_matrix(m[0], m[2], m[4], m[8], m[6], ph_buf, out_size, smax)
    ax = _axis_matrix(m[1], m[3], m[5], m[9], m[7], pw_buf, out_size, smax)

    # full fp32 MXU passes for fp32 features (the default single
    # bf16 pass costs ~6e-3 relative vs the XLA gather path); bf16
    # features use the native mode like every other bf16 matmul
    prec = (jax.lax.Precision.HIGHEST
            if patch.dtype == jnp.float32 else jax.lax.Precision.DEFAULT)
    t = jax.lax.dot_general(
        ay.astype(patch.dtype), patch[slot].reshape(ph_buf, pw_buf * c),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec,
    )  # [O, PW·C]
    t = t.reshape(out_size, pw_buf, c).transpose(1, 0, 2)
    o2 = jax.lax.dot_general(
        ax.astype(jnp.float32), t.reshape(pw_buf, out_size * c),
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.HIGHEST
                   if patch.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT),
    )  # [OX, OY·C]
    o2 = o2.reshape(out_size, out_size, c).transpose(1, 0, 2)
    out_ref[0] = (o2 * m[10]).astype(out_ref.dtype)


def _prep(
    feat_shapes: Sequence[tuple],
    strides: Sequence[int],
    out_size: int,
    sampling_ratio: int,
    finest_scale: float,
    max_grid: Optional[int],
    rois: jax.Array,
    valid: jax.Array,
):
    """Per-roi scalars shared by the forward and backward kernels: FPN
    level, batch index, patch origin, and the 16-wide fp32 metadata row
    the kernels rebuild their weight matrices from.  Pure [B, P]-sized
    math — cheap enough that the VJP recomputes it instead of saving
    residuals."""
    num_levels = len(strides)
    b, p = rois.shape[0], rois.shape[1]
    heights = np.array([s[0] for s in feat_shapes], np.int32)
    widths = np.array([s[1] for s in feat_shapes], np.int32)
    # the DMA column start must be 8-aligned: zero-pad level widths to
    # multiples of 8 so an aligned-down px0 can still reach the last
    # columns (weights never touch the pad: they are masked at real W)
    widths_p = np.array([_round8(int(w)) for w in widths], np.int32)
    ph_buf = min(PATCH_H, int(heights.max()))
    pw_buf = min(PATCH_W, int(widths_p.max()))

    lvl = map_roi_levels(rois, num_levels, finest_scale)  # [B, P]
    stride = jnp.asarray(np.asarray(strides, np.float32))[lvl]
    h_l = jnp.asarray(heights)[lvl].astype(jnp.float32)
    w_l = jnp.asarray(widths)[lvl].astype(jnp.float32)
    w_lp = jnp.asarray(widths_p)[lvl].astype(jnp.float32)
    scale = 1.0 / stride
    x1 = rois[..., 0] * scale - 0.5
    y1 = rois[..., 1] * scale - 0.5
    x2 = rois[..., 2] * scale - 0.5
    y2 = rois[..., 3] * scale - 0.5
    bin_y = (y2 - y1) / out_size
    bin_x = (x2 - x1) / out_size
    if sampling_ratio > 0:
        smax = sampling_ratio
        gy = jnp.full_like(y1, smax)
        gx = jnp.full_like(x1, smax)
    else:
        smax = (
            int(max_grid)
            if max_grid is not None
            else default_max_grid(feat_shapes, out_size)
        )
        gy = jnp.clip(jnp.ceil(bin_y), 1, smax)
        gx = jnp.clip(jnp.ceil(bin_x), 1, smax)

    # patch origins: floor(edge) clamped so the static patch stays
    # in-bounds at the roi's level; the column origin additionally
    # aligns DOWN to 8 (PATCH_W carries 8 cells of slack for this)
    ph_l = jnp.minimum(h_l, float(ph_buf))
    pw_l = jnp.minimum(w_lp, float(pw_buf))
    py0 = jnp.clip(jnp.floor(y1), 0.0, jnp.maximum(h_l - ph_l, 0.0))
    px0 = jnp.clip(jnp.floor(x1), 0.0, jnp.maximum(w_lp - pw_l, 0.0))
    px0 = jnp.floor(px0 / 8.0) * 8.0

    meta = jnp.stack(
        [y1, x1, bin_y, bin_x, gy, gx, h_l, w_l, py0, px0,
         valid.astype(jnp.float32),
         jnp.zeros_like(y1), jnp.zeros_like(y1), jnp.zeros_like(y1),
         jnp.zeros_like(y1), jnp.zeros_like(y1)],
        axis=-1,
    ).reshape(b * p, 1, 16)

    r_total = b * p
    bidx = jnp.broadcast_to(
        jnp.arange(b, dtype=jnp.int32)[:, None], (b, p)
    ).reshape(r_total)
    return dict(
        lvl=lvl.reshape(r_total),
        bidx=bidx,
        py0=py0.astype(jnp.int32).reshape(r_total),
        px0=px0.astype(jnp.int32).reshape(r_total),
        meta=meta,
        smax=smax,
        ph_buf=ph_buf,
        pw_buf=pw_buf,
        heights=heights,
        widths=widths,
        widths_p=widths_p,
        r_total=r_total,
    )


def _fwd_call(feats, rois, valid, statics):
    (strides, out_size, sampling_ratio, finest_scale, max_grid,
     interpret, feat_shapes) = statics
    b, p = rois.shape[0], rois.shape[1]
    c = feats[0].shape[-1]
    pr = _prep(feat_shapes, strides, out_size, sampling_ratio,
               finest_scale, max_grid, rois, valid)
    feats = [
        jnp.pad(f, ((0, 0), (0, 0), (0, int(wp - w)), (0, 0)))
        if wp != w else f
        for f, w, wp in zip(feats, pr["widths"], pr["widths_p"])
    ]
    ph_buf, pw_buf, smax = pr["ph_buf"], pr["pw_buf"], pr["smax"]
    r_total = pr["r_total"]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(r_total,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda r, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(f.shape, lambda r, *_: (0, 0, 0, 0),
                         memory_space=pl.ANY)
            for f in feats
        ],
        out_specs=pl.BlockSpec(
            (1, out_size, out_size, c), lambda r, *_: (r, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, ph_buf, pw_buf, c), feats[0].dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel,
            feats_hw=tuple((int(f.shape[1]), int(f.shape[2]))
                           for f in feats),
            out_size=out_size, smax=smax, ph_buf=ph_buf, pw_buf=pw_buf,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (r_total, out_size, out_size, c), feats[0].dtype
        ),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pr["lvl"],
        pr["bidx"],
        pr["py0"],
        pr["px0"],
        pr["meta"],
        *feats,
    )
    return out.reshape(b, p, out_size, out_size, c)


def _bwd_kernel(
    # scalar prefetch (SMEM)
    lvl_ref, bidx_ref, py0_ref, px0_ref,
    # blocked VMEM inputs
    meta_ref,  # [1, 1, 16] fp32 per-roi metadata
    g_ref,     # [1, O, O, C] incoming cotangent for this roi
    *rest,
    feats_hw: Sequence[tuple], out_size: int, smax: int,
    ph_buf: int, pw_buf: int,
):
    """Transpose of :func:`_kernel` per roi: the patch cotangent is the
    separable product Ayᵀ·G·Ax (two skinny fp32 matmuls), accumulated
    into the level's gradient array by a serialized read-modify-write
    DMA.  The grid runs rois sequentially on TPU and both DMAs complete
    inside the body, so overlapping roi patches never lose updates (the
    price is no double-buffering; backward is not the serving path)."""
    num_levels = len(feats_hw)
    # rest: aliased grad inputs (ANY) x L, grad outputs (ANY) x L,
    # then scratch: acc VMEM + one DMA semaphore
    gout_refs = rest[num_levels:2 * num_levels]
    acc, sem = rest[2 * num_levels], rest[2 * num_levels + 1]
    r = pl.program_id(0)
    c = g_ref.shape[-1]

    m = meta_ref[0, 0]
    ay = _axis_matrix(m[0], m[2], m[4], m[8], m[6], ph_buf, out_size, smax)
    ax = _axis_matrix(m[1], m[3], m[5], m[9], m[7], pw_buf, out_size, smax)
    g = g_ref[0].astype(jnp.float32) * m[10]  # valid-masked, [O, O, C]
    # t[py, ox·c] = Σ_oy ay[oy, py] · g[oy, ox, c]
    t = jax.lax.dot_general(
        ay, g.reshape(out_size, out_size * c),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [PH, O·C]
    t = t.reshape(ph_buf, out_size, c).transpose(1, 0, 2)
    gp = jax.lax.dot_general(
        ax, t.reshape(out_size, ph_buf * c),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [PW, PH·C]
    gp = gp.reshape(pw_buf, ph_buf, c).transpose(1, 0, 2)  # [PH, PW, C]

    for l, (h_l, w_l) in enumerate(feats_hw):
        ph, pw = min(ph_buf, h_l), min(pw_buf, w_l)

        @pl.when(lvl_ref[r] == l)
        def _(l=l, ph=ph, pw=pw):
            dst = gout_refs[l].at[
                bidx_ref[r],
                pl.ds(py0_ref[r], ph),
                pl.ds(pl.multiple_of(px0_ref[r], 8), pw),
                :,
            ]
            cp_in = pltpu.make_async_copy(dst, acc.at[0:ph, 0:pw, :], sem)
            cp_in.start()
            cp_in.wait()
            acc[0:ph, 0:pw, :] = acc[0:ph, 0:pw, :] + gp[0:ph, 0:pw, :]
            cp_out = pltpu.make_async_copy(acc.at[0:ph, 0:pw, :], dst, sem)
            cp_out.start()
            cp_out.wait()


def _bwd_call(g, rois, valid, statics):
    (strides, out_size, sampling_ratio, finest_scale, max_grid,
     interpret, feat_shapes) = statics
    b, p = rois.shape[0], rois.shape[1]
    c = g.shape[-1]
    pr = _prep(feat_shapes, strides, out_size, sampling_ratio,
               finest_scale, max_grid, rois, valid)
    ph_buf, pw_buf, smax = pr["ph_buf"], pr["pw_buf"], pr["smax"]
    r_total = pr["r_total"]
    num_levels = len(feat_shapes)
    padded_hw = [(int(h), int(wp))
                 for h, wp in zip(pr["heights"], pr["widths_p"])]
    # fp32 accumulators at the PADDED widths (same coordinate system the
    # forward DMAs in); the pad columns only ever receive masked zeros
    gz = [jnp.zeros((b, h, wp, c), jnp.float32) for h, wp in padded_hw]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(r_total,),
        in_specs=[
            pl.BlockSpec((1, 1, 16), lambda r, *_: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, out_size, out_size, c),
                         lambda r, *_: (r, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ] + [
            pl.BlockSpec(z.shape, lambda r, *_: (0, 0, 0, 0),
                         memory_space=pl.ANY)
            for z in gz
        ],
        out_specs=[
            pl.BlockSpec(z.shape, lambda r, *_: (0, 0, 0, 0),
                         memory_space=pl.ANY)
            for z in gz
        ],
        scratch_shapes=[
            pltpu.VMEM((ph_buf, pw_buf, c), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    # operand order: 4 scalar-prefetch + meta + g + the L aliased
    # accumulators -> alias input 6+i onto output i
    grads = pl.pallas_call(
        functools.partial(
            _bwd_kernel,
            feats_hw=tuple(padded_hw),
            out_size=out_size, smax=smax, ph_buf=ph_buf, pw_buf=pw_buf,
        ),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(z.shape, jnp.float32) for z in gz
        ],
        input_output_aliases={6 + i: i for i in range(num_levels)},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        pr["lvl"],
        pr["bidx"],
        pr["py0"],
        pr["px0"],
        pr["meta"],
        g.reshape(r_total, out_size, out_size, c),
        *gz,
    )
    dtypes = [jnp.dtype(g.dtype)] * num_levels
    return tuple(
        gr[:, :, : int(w), :].astype(dt)
        for gr, w, dt in zip(grads, pr["widths"], dtypes)
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _patch_core(feats, rois, valid, statics):
    return _fwd_call(feats, rois, valid, statics)


def _patch_core_fwd(feats, rois, valid, statics):
    # residuals are just the roi geometry: the backward rebuilds its
    # weight matrices from scratch, so NO forward activations are saved
    # (the VJP is rematerialization-free by construction)
    return _fwd_call(feats, rois, valid, statics), (rois, valid)


def _patch_core_bwd(statics, res, g):
    rois, valid = res
    grads = _bwd_call(g, rois, valid, statics)
    # no gradient to roi coordinates or the valid mask — matching
    # torchvision/mmcv RoIAlign, which differentiates w.r.t. input only
    return (grads, jnp.zeros_like(rois), jnp.zeros_like(valid))


_patch_core.defvjp(_patch_core_fwd, _patch_core_bwd)


@functools.partial(
    jax.jit,
    static_argnames=(
        "strides", "out_size", "sampling_ratio", "finest_scale",
        "max_grid", "interpret",
    ),
)
def roi_align_patch(
    feats: Sequence[jax.Array],
    rois: jax.Array,
    roi_valid: Optional[jax.Array] = None,
    strides: Sequence[int] = (4, 8, 16, 32),
    out_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
    max_grid: Optional[int] = None,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in for :func:`mrla_tpu.detect.roi_align.batched_roi_align`
    (same args/semantics) on the patch-DMA Pallas path.

    Requires C % 128 == 0 (DMA lane tiling).  ``sampling_ratio=0`` is
    the adaptive grid — here it costs the same as static grids.

    Differentiable (round 5): a custom VJP scatters each roi's patch
    cotangent Ayᵀ·G·Ax back into the feature pyramid with the same
    patch-DMA structure (see :func:`_bwd_kernel`), so training can run
    the reference presets' exact ``sampling_ratio=0`` grid
    (faster_rcnn_r50mrlal_fpn.py:40) at Pallas speed.  Gradients flow
    to ``feats`` only (not roi coordinates), matching torchvision/mmcv.
    """
    c = feats[0].shape[-1]
    assert c % 128 == 0, "patch DMA needs lane-aligned channels"
    b, p = rois.shape[0], rois.shape[1]
    valid = (
        jnp.ones((b, p), jnp.float32)
        if roi_valid is None
        else roi_valid.astype(jnp.float32)
    )
    statics = (
        tuple(int(s) for s in strides),
        int(out_size),
        int(sampling_ratio),
        float(finest_scale),
        None if max_grid is None else int(max_grid),
        bool(interpret),
        tuple((int(f.shape[1]), int(f.shape[2])) for f in feats),
    )
    return _patch_core(tuple(feats), rois, valid, statics)
