"""Layout-native mega-fused MRLA block tail on the [H, W, B, C] view.

Round-1 HLO analysis (ROADMAP.md) showed XLA lays conv activations out as
bf16{3,0,2,1} — bytes identical to a ROW-MAJOR [H, W, B, C] array — while
pallas pins row-major on the logical shape, forcing layout copies worth
~1 ms/block.  This kernel consumes jnp.transpose(z, (1,2,0,3)) views, which
XLA folds into bitcasts (verified: 0 transposes in optimized HLO), and is
written for that layout natively:

  * every (h, w) position is a [B, CT] tile (sublane=batch, lane=channel) —
    the ideal depthwise-conv layout: all 9 taps are tile-granular address
    shifts, no sublane rolls, no relayouts;
  * W is the sliding axis: a 3-column ring buffer in VMEM, the next column
    DMA'd while the current one computes (columns are [H, 1, B, CT]);
  * computes the full block tail: out = relu(z + id);
    y = out + (dwconv3x3(out)·gate + λ·id)·bn_scale + bn_bias.

Grid: (C / CT,).  Inputs stay in ANY memory space; the kernel DMAs columns
explicitly.  Output written column-by-column.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mrla_tpu.kernels.mrla_epilogue import mrla_light_gate

CHANNEL_TILE = 128


def _kernel(
    z_ref,  # ANY [H, W, B, C] full array (pre-residual, HWBC view)
    i_ref,  # ANY [H, W, B, C]
    gate_ref,  # VMEM [1, B, C]
    wv_ref,  # VMEM [9, C]
    lam_ref,  # VMEM [1, C]
    sc_ref,  # VMEM [1, C]
    bi_ref,  # VMEM [1, C]
    y_ref,  # ANY [H, W, B, C] full array
    zbuf,  # VMEM scratch [3, H, 1, BT, CT]  (ring: z columns)
    ibuf,  # VMEM scratch [3, H, 1, BT, CT]  (ring: id columns)
    obuf,  # VMEM scratch [3, H, 1, B, CT]  fp32 relu(z+id) columns
    ybuf,  # VMEM scratch [1, H, 1, B, CT]  output staging
    in_sems,  # DMA sems (2, 3)
    out_sem,  # DMA sem ()
):
    h, w = z_ref.shape[0], z_ref.shape[1]
    b_full = z_ref.shape[2]
    bt = zbuf.shape[3]
    b = bt
    ct = zbuf.shape[4]
    n_ct = z_ref.shape[3] // ct
    n_bt = b_full // bt

    # single program; channel and batch tiles iterate in STATIC python loops
    # so every DMA slice start is a compile-time constant (Mosaic
    # provability); the batch dim is untiled (third-minor) so any static
    # chunking is legal.
    for k in range(n_ct):
      for bh in range(n_bt):
        def dma_in(slot, col, k=k, bh=bh):
            return (
                pltpu.make_async_copy(
                    z_ref.at[:, pl.ds(col, 1), pl.ds(bh * bt, bt),
                             pl.ds(k * ct, ct)],
                    zbuf.at[slot],
                    in_sems.at[0, slot],
                ),
                pltpu.make_async_copy(
                    i_ref.at[:, pl.ds(col, 1), pl.ds(bh * bt, bt),
                             pl.ds(k * ct, ct)],
                    ibuf.at[slot],
                    in_sems.at[1, slot],
                ),
            )

        for c0 in (0, 1):
            for d in dma_in(c0 % 3, c0):
                d.start()

        gate = gate_ref[
            0, bh * bt:(bh + 1) * bt, k * ct:(k + 1) * ct
        ].astype(jnp.float32)  # [BT, CT]
        lam = lam_ref[0, k * ct:(k + 1) * ct].astype(jnp.float32).reshape(1, ct)
        sc = sc_ref[0, k * ct:(k + 1) * ct].astype(jnp.float32).reshape(1, ct)
        bi = bi_ref[0, k * ct:(k + 1) * ct].astype(jnp.float32).reshape(1, ct)
        taps = wv_ref[:, k * ct:(k + 1) * ct].astype(jnp.float32)  # [9, CT]

        def relu_col(slot, ring_pos):
            obuf[ring_pos] = jnp.maximum(
                zbuf[slot].astype(jnp.float32) + ibuf[slot].astype(jnp.float32),
                0.0,
            )

        def compute_col(col, left, mid, right, id_slot, k=k, gate=gate,
                        lam=lam, sc=sc, bi=bi, taps=taps):
            om = obuf[mid][:, 0]  # [H, B, CT] fp32
            zero_row = jnp.zeros((1, b, ct), jnp.float32)

            def shifted(body, dh):
                if dh == -1:
                    return jnp.concatenate([zero_row, body[:-1]], axis=0)
                if dh == 1:
                    return jnp.concatenate([body[1:], zero_row], axis=0)
                return body

            acc = jnp.zeros((h, b, ct), jnp.float32)
            for dwi, ring in ((0, left), (1, mid), (2, right)):
                body = obuf[ring][:, 0]
                if dwi == 0:
                    valid = col > 0
                elif dwi == 2:
                    valid = col < w - 1
                else:
                    valid = None
                for dh in (-1, 0, 1):
                    tap = taps[(dh + 1) * 3 + dwi].reshape(1, 1, ct)
                    term = shifted(body, dh) * tap
                    acc = acc + (term if valid is None
                                 else jnp.where(valid, term, 0.0))

            idv = ibuf[id_slot][:, 0].astype(jnp.float32)
            y = om + (acc * gate[None] + lam[None] * idv) * sc[None] + bi[None]
            ybuf[0] = y[:, None].astype(ybuf.dtype)
            out_dma = pltpu.make_async_copy(
                ybuf.at[0],
                y_ref.at[:, pl.ds(col, 1), pl.ds(bh * bt, bt),
                         pl.ds(k * ct, ct)],
                out_sem,
            )
            out_dma.start()
            out_dma.wait()

        for d in dma_in(0, 0):
            d.wait()
        relu_col(0, 0)

        def loop(col, _):
            @pl.when(col + 2 < w)
            def _():
                for d in dma_in((col + 2) % 3, col + 2):
                    d.start()

            @pl.when(col + 1 < w)
            def _():
                for d in dma_in((col + 1) % 3, col + 1):
                    d.wait()
                relu_col((col + 1) % 3, (col + 1) % 3)

            compute_col(col, (col - 1) % 3, col % 3, (col + 1) % 3, col % 3)
            return 0

        jax.lax.fori_loop(0, w, loop, 0)


def mrla_block_tail_hwbc(
    z: jax.Array,  # [B, H, W, C] logical (XLA layout {3,0,2,1})
    identity: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    lam: jax.Array,
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    heads: int,
) -> jax.Array:
    """y = epilogue(relu(z + id), id) via the HWBC layout-native kernel.

    Returns the logical [B, H, W, C] result (the boundary transposes fold
    into bitcasts against XLA's native activation layout)."""
    bsz, h, w, c = z.shape
    ct = min(CHANNEL_TILE, c)
    assert c % ct == 0

    out_act = jax.nn.relu(
        z.astype(jnp.float32) + identity.astype(jnp.float32)
    ).astype(z.dtype)
    gate = mrla_light_gate(out_act, wq, wk, heads)  # [B, C] fp32

    zt = jnp.transpose(z, (1, 2, 0, 3))
    it = jnp.transpose(identity, (1, 2, 0, 3))

    btile = min(bsz, 64)
    if bsz % btile != 0:
        # the kernel loops b_full // btile batch tiles — a non-multiple
        # would silently leave the trailing images' output uninitialized
        raise ValueError(
            f"batch {bsz} must be a multiple of the batch tile {btile}"
        )
    col_shape = (3, h, 1, btile, ct)
    full = lambda: pl.BlockSpec(
        (h, w, bsz, c), lambda i: (0, 0, 0, 0), memory_space=pl.ANY
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(1,),
        in_specs=[
            full(),
            full(),
            pl.BlockSpec((1, bsz, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=full(),
        scratch_shapes=[
            pltpu.VMEM(col_shape, z.dtype),
            pltpu.VMEM(col_shape, z.dtype),
            pltpu.VMEM((3, h, 1, btile, ct), jnp.float32),
            pltpu.VMEM((1, h, 1, btile, ct), z.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    yt = pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h, w, bsz, c), z.dtype),
    )(
        zt,
        it,
        gate.reshape(1, bsz, c).astype(jnp.float32),
        wv.reshape(9, c).astype(jnp.float32),
        lam.reshape(1, c).astype(jnp.float32),
        bn_scale.reshape(1, c).astype(jnp.float32),
        bn_bias.reshape(1, c).astype(jnp.float32),
    )
    return jnp.transpose(yt, (2, 0, 1, 3))
