"""Mega-fused MRLA block tail + next-block conv1, HWBC layout-native.

Round-1 post-mortem (ROADMAP.md): every epilogue kernel won isolated and
lost in-model, for two structural reasons
  1. the kernels consumed (z, identity) and recomputed relu(z+id) — but the
     gate's GAP had ALREADY read z+id in XLA, so the activations crossed
     HBM twice more than the jnp path;
  2. the jnp epilogue's elementwise tail fuses into the NEXT block's conv1
     operand load (producer-consumer fusion a custom call cannot join).

This kernel removes both:
  * it consumes `out = relu(z + id)` — materialized once by XLA's
    conv3+add+relu fusion, whose multi-output also feeds the GAP reduce, so
    there is no duplicate traffic;
  * it computes the next block's 1x1 conv INSIDE the kernel: in the HWBC
    view a 1x1 conv is a pure [H·W·B, C] @ [C, C1] matmul (MXU), so the
    fusion the custom call used to break is now internal.

Math (reference resnet_mrla_light.py:113-116, BN folded):
    y  = out + (dwconv3x3(out)·gate + λ·id)·bn_scale + bn_bias
    x1 = relu(y @ W1 + b1)                      # next block's conv1
Returns (y, x1).

Layout + pipeline: operands are consumed as jnp.transpose(·, (1,2,0,3))
views, which fold into bitcasts against XLA's native bf16{3,0,2,1}
activation layout (verified round 1).  W slides in CHUNKS of CW columns —
a round-2 lesson: per-single-column pipelines are latency-bound (~30 µs of
sync overhead per iteration dwarfs the 5 µs of data movement), so the
kernel moves [H, CW, BT, C] chunks with a 4-deep input ring (manual DMA,
compile-time-constant slice starts — the Mosaic recipe that avoids the
300-400 s compile pathology) and double-buffered output staging.  dwconv
halo columns come from the neighboring ring slots; depth 4 because compute
at chunk c reads c-1's last column while c+2 prefetches — a 3-ring would
alias them.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

RING = 4


def _pick_cw(w: int) -> int:
    for cand in (8, 7, 4, 2, 1):
        if w % cand == 0:
            return cand
    return 1


def _pick_bt(bsz: int, h: int, cw: int, c: int, c1p: int,
             budget: int = 80 * 1024 * 1024) -> int:
    """Largest batch tile whose scratch buffers fit the VMEM budget."""
    for bt in (64, 32, 16, 8, 4, 2, 1):
        if bsz % bt:
            continue
        per_elem = 2  # activation dtype is bf16 in practice
        scratch = (2 * RING + 2) * h * cw * bt * c * per_elem \
            + 2 * h * cw * bt * c1p * per_elem
        if scratch <= budget:
            return bt
    return 1


def _kernel(
    o_ref,  # ANY [H, W, B, C]  out = relu(z + id), HWBC view
    i_ref,  # ANY [H, W, B, C]  identity
    gate_ref,  # VMEM [1, B, C] fp32
    wv_ref,  # VMEM [9, C] fp32
    lam_ref,  # VMEM [1, C] fp32
    sc_ref,  # VMEM [1, C] fp32
    bi_ref,  # VMEM [1, C] fp32
    w1_ref,  # VMEM [C, C1]  next conv1 kernel (activation dtype)
    b1_ref,  # VMEM [1, C1] fp32
    y_ref,  # ANY [H, W, B, C]
    x1_ref,  # ANY [H, W, B, C1]
    obuf,  # VMEM scratch [RING, H, CW, BT, C]  (ring of out chunks)
    ibuf,  # VMEM scratch [RING, H, CW, BT, C]  (ring of id chunks)
    ybuf,  # VMEM scratch [2, H, CW, BT, C]   y staging (double buffer)
    x1buf,  # VMEM scratch [2, H, CW, BT, C1]
    in_sems,  # DMA sems (2, RING)
    out_sems,  # DMA sems (2, 2)
):
    h, w = o_ref.shape[0], o_ref.shape[1]
    b_full = o_ref.shape[2]
    cw = obuf.shape[2]
    bt = obuf.shape[3]
    c = obuf.shape[4]
    c1 = x1buf.shape[4]
    n_bt = b_full // bt
    n_ch = w // cw

    for bh in range(n_bt):  # static python loop: constant batch slice starts
        def dma_in(slot, chunk, bh=bh):
            return (
                pltpu.make_async_copy(
                    o_ref.at[:, pl.ds(chunk * cw, cw), pl.ds(bh * bt, bt), :],
                    obuf.at[slot],
                    in_sems.at[0, slot],
                ),
                pltpu.make_async_copy(
                    i_ref.at[:, pl.ds(chunk * cw, cw), pl.ds(bh * bt, bt), :],
                    ibuf.at[slot],
                    in_sems.at[1, slot],
                ),
            )

        for c0 in range(min(2, n_ch)):
            for d in dma_in(c0, c0):
                d.start()

        gate = gate_ref[0, bh * bt:(bh + 1) * bt, :]  # [BT, C] fp32
        lam = lam_ref[0].reshape(1, 1, c)
        sc = sc_ref[0].reshape(1, 1, c)
        bi = bi_ref[0].reshape(1, 1, c)
        taps = wv_ref[...]  # [9, C] fp32
        w1 = w1_ref[...]  # [C, C1]
        b1 = b1_ref[0].reshape(1, c1)

        def compute_chunk(chunk, left, mid, right, slot, bh=bh, gate=gate,
                          lam=lam, sc=sc, bi=bi, taps=taps, w1=w1, b1=b1):
            om = obuf[mid].astype(jnp.float32)  # [H, CW, BT, C]
            # halo columns from the neighboring ring slots (zero at edges)
            lcol = jnp.where(
                chunk > 0, obuf[left][:, cw - 1:cw].astype(jnp.float32), 0.0
            )
            rcol = jnp.where(
                chunk < n_ch - 1, obuf[right][:, 0:1].astype(jnp.float32), 0.0
            )
            ext = jnp.concatenate([lcol, om, rcol], axis=1)  # [H, CW+2, BT, C]

            zero_row = jnp.zeros((1, cw + 2, bt, c), jnp.float32)

            def hshift(dh):
                if dh == -1:
                    return jnp.concatenate([zero_row, ext[:-1]], axis=0)
                if dh == 1:
                    return jnp.concatenate([ext[1:], zero_row], axis=0)
                return ext

            acc = jnp.zeros((h, cw, bt, c), jnp.float32)
            for dh in (-1, 0, 1):
                shifted = hshift(dh)
                for dwi in (0, 1, 2):
                    tap = taps[(dh + 1) * 3 + dwi].reshape(1, 1, 1, c)
                    acc = acc + shifted[:, dwi:dwi + cw] * tap

            idv = ibuf[mid].astype(jnp.float32)
            y = om + (acc * gate[None, None] + lam[None] * idv) * sc[None] \
                + bi[None]
            yb = y.astype(ybuf.dtype)  # [H, CW, BT, C]
            ybuf[slot] = yb
            # next block's conv1: [H·CW·BT, C] @ [C, C1] on the MXU
            # precision pinned: ambient HIGHEST (e.g. a test module's
            # jax_default_matmul_precision=float32) is uncompilable for a
            # bf16 lhs under Mosaic ("Bad lhs type"); DEFAULT is the
            # single-pass MXU semantics this kernel is measured at.
            x1 = jax.lax.dot_general(
                yb.reshape(h * cw * bt, c), w1,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            x1 = jnp.maximum(x1 + b1, 0.0)
            x1buf[slot] = x1.reshape(h, cw, bt, c1).astype(x1buf.dtype)

            pltpu.make_async_copy(
                ybuf.at[slot],
                y_ref.at[:, pl.ds(chunk * cw, cw), pl.ds(bh * bt, bt), :],
                out_sems.at[0, slot],
            ).start()
            pltpu.make_async_copy(
                x1buf.at[slot],
                x1_ref.at[:, pl.ds(chunk * cw, cw), pl.ds(bh * bt, bt), :],
                out_sems.at[1, slot],
            ).start()

        for d in dma_in(0, 0):
            d.wait()

        def loop(chunk, _):
            @pl.when(chunk + 2 < n_ch)
            def _():
                for d in dma_in((chunk + 2) % RING, chunk + 2):
                    d.start()

            @pl.when(chunk + 1 < n_ch)
            def _():
                for d in dma_in((chunk + 1) % RING, chunk + 1):
                    d.wait()

            # drain this staging slot's previous output DMAs before reuse
            @pl.when(chunk >= 2)
            def _():
                slot = chunk % 2
                pltpu.make_async_copy(
                    ybuf.at[slot], ybuf.at[slot], out_sems.at[0, slot]
                ).wait()
                pltpu.make_async_copy(
                    x1buf.at[slot], x1buf.at[slot], out_sems.at[1, slot]
                ).wait()

            compute_chunk(chunk, (chunk - 1) % RING, chunk % RING,
                          (chunk + 1) % RING, chunk % 2)
            return 0

        jax.lax.fori_loop(0, n_ch, loop, 0)

        # drain the in-flight output DMAs (slots used by the last chunks)
        if n_ch == 1:
            last_slots = (0,)
        else:
            last_slots = ((n_ch - 2) % 2, (n_ch - 1) % 2)
        for slot in last_slots:
            pltpu.make_async_copy(
                ybuf.at[slot], ybuf.at[slot], out_sems.at[0, slot]
            ).wait()
            pltpu.make_async_copy(
                x1buf.at[slot], x1buf.at[slot], out_sems.at[1, slot]
            ).wait()


def mrla_block_tail_fused_next(
    out: jax.Array,  # [B, H, W, C] logical — relu(z + identity)
    identity: jax.Array,  # [B, H, W, C]
    gate: jax.Array,  # [B, C] fp32 (mrla_light_gate)
    wv: jax.Array,
    lam: jax.Array,
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    w1_next: jax.Array,  # [1, 1, C, C1] or [C, C1] — next block's conv1
    b1_next: jax.Array,  # [C1]
    batch_tile: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (y [B,H,W,C], x1 [B,H,W,C1]) — the MRLA block output and the
    next block's post-conv1 activation, in one HBM pass."""
    bsz, h, w, c = out.shape
    w1 = w1_next.reshape(c, -1)
    c1 = w1.shape[1]
    # Mosaic DMA slices must be lane-tile (128) aligned: pad the x1 channel
    # dim up to 128 (stage-1's next conv1 is 64-wide) and slice it back off
    # outside the kernel.
    c1p = max(c1, 128)
    if c1p != c1:
        w1 = jnp.pad(w1, ((0, 0), (0, c1p - c1)))
        b1_next = jnp.pad(b1_next.reshape(-1), (0, c1p - c1))
    cw = _pick_cw(w)
    bt = _pick_bt(bsz, h, cw, c, c1p)
    if batch_tile is not None:
        bt = min(bt, batch_tile) if bsz % batch_tile == 0 else bt
    assert bsz % bt == 0 and w >= 2

    ot = jnp.transpose(out, (1, 2, 0, 3))
    it = jnp.transpose(identity, (1, 2, 0, 3))

    full = lambda ch: pl.BlockSpec(
        (h, w, bsz, ch), lambda i: (0, 0, 0, 0), memory_space=pl.ANY
    )
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            full(c),
            full(c),
            vmem((1, bsz, c)),
            vmem((9, c)),
            vmem((1, c)),
            vmem((1, c)),
            vmem((1, c)),
            vmem((c, c1p)),
            vmem((1, c1p)),
        ],
        out_specs=[full(c), full(c1p)],
        scratch_shapes=[
            pltpu.VMEM((RING, h, cw, bt, c), out.dtype),
            pltpu.VMEM((RING, h, cw, bt, c), out.dtype),
            pltpu.VMEM((2, h, cw, bt, c), out.dtype),
            pltpu.VMEM((2, h, cw, bt, c1p), out.dtype),
            pltpu.SemaphoreType.DMA((2, RING)),
            pltpu.SemaphoreType.DMA((2, 2)),
        ],
    )
    yt, x1t = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024,
        ),
        out_shape=[
            jax.ShapeDtypeStruct((h, w, bsz, c), out.dtype),
            jax.ShapeDtypeStruct((h, w, bsz, c1p), out.dtype),
        ],
    )(
        ot,
        it,
        gate.reshape(1, bsz, c).astype(jnp.float32),
        wv.reshape(9, c).astype(jnp.float32),
        lam.reshape(1, c).astype(jnp.float32),
        bn_scale.reshape(1, c).astype(jnp.float32),
        bn_bias.reshape(1, c).astype(jnp.float32),
        w1.astype(out.dtype),
        b1_next.reshape(1, c1p).astype(jnp.float32),
    )
    x1 = jnp.transpose(x1t, (2, 0, 1, 3))
    if c1p != c1:
        x1 = x1[..., :c1]
    return jnp.transpose(yt, (2, 0, 1, 3)), x1
