"""MRLA block tail + next conv1 as a lag-1 row-pipelined Pallas kernel.

Third-generation kernel.  Round-1/2 post-mortems (ROADMAP.md) plus this
round's measurements established the design constraints:

  1. operands must be consumed in XLA's native activation layout
     bf16{3,0,2,1} — i.e. as jnp.transpose(x, (1,2,0,3)) [H,W,B,C] views
     that fold into bitcasts — or XLA re-materializes the producer conv's
     output in row-major (+~1 ms/block, the round-1 loss);
  2. every DMA must move full (B, C) planes — [1, W, B, C] rows are
     contiguous HBM spans (64 KB at stage 1); blocking B or C into tiles
     cuts the chunk to 2 KB and lands 5.8x off the bandwidth floor
     (measured: a trivial [8,56,8,128]-blocked copy runs 2.88 ms vs the
     0.50 ms floor at stage-1 size);
  3. a custom call in-model costs its own traffic + ~0.3-0.4 ms of lost
     overlap (measured with a passthrough copy), while XLA's fused tail
     runs only ~35-60% above floor — so the kernel must ALSO absorb the
     next block's 1x1 conv (an in-kernel MXU matmul) to amortize the
     boundary.

Pipeline shape: grid=(H+1,).  Program k receives `out` row min(k, H-1)
(auto-pipelined by pallas) and keeps the previous two rows in VMEM scratch;
it computes OUTPUT row r = k-1 (needs out rows r-1, r, r+1), so the output
BlockSpecs lag one step (index max(k-1, 0)) — pallas' revolving-window
copy-out makes the lag free.  The depthwise 3x3 needs only W-shifts within
a row (register remaps on the second-major dim) plus the scratch rows.

Math (reference resnet_mrla_light.py:113-116, BN pre-folded; eq. 8 of
arXiv:2302.03985):
    y  = out + (dwconv3x3(out) * gate + lam * identity) * bn_scale + bn_bias
    x1 = relu(y @ W1 + b1)        # the NEXT block's conv1 (1x1 -> matmul)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _wshift(row, dw):
    """row [W, B, C]; result[w] = row[w + dw], zero-padded at the edges."""
    if dw == 0:
        return row
    zero = jnp.zeros_like(row[:1])
    if dw == 1:
        return jnp.concatenate([row[1:], zero], axis=0)
    return jnp.concatenate([zero, row[:-1]], axis=0)


def _rowtail_kernel(*refs, with_x1: bool):
    # Ref order: o, i, gs, wv, ls, bi, [w1, b1,] y, [x1,] sprev — the
    # w1/b1/x1 refs exist only when with_x1 (see mrla_rowtail's specs).
    #   o_ref  VMEM [1, W, B, C]  out row min(k, H-1)
    #   i_ref  VMEM [1, W, B, C]  identity row max(k-1, 0)
    #   gs_ref VMEM [1, B, C]     gate * bn_scale (fp32)
    #   wv_ref VMEM [9, C];  ls/bi VMEM [1, C]
    #   y_ref  VMEM [1, W, B, C]  output row k-1 (lagged revolving block)
    #   sprev  VMEM scratch [2, W, B, C] ring of previous out rows
    if with_x1:
        (o_ref, i_ref, gs_ref, wv_ref, ls_ref, bi_ref, w1_ref, b1_ref,
         y_ref, x1_ref, sprev) = refs
    else:
        (o_ref, i_ref, gs_ref, wv_ref, ls_ref, bi_ref, y_ref, sprev) = refs
        w1_ref = b1_ref = x1_ref = None
    k = pl.program_id(0)
    h = pl.num_programs(0) - 1
    cur = o_ref[0]  # [W, B, C] bf16 — out row min(k, h-1)

    @pl.when(k > 0)
    def _():
        r = k - 1
        r0 = sprev[(k + 1) % 2].astype(jnp.float32)  # out row r
        # row r-1 is uninitialized scratch when r == 0: select (not multiply)
        # so garbage bit patterns (possible NaNs) cannot propagate.
        rm1 = jnp.where(r > 0, sprev[k % 2].astype(jnp.float32), 0.0)
        rp1 = jnp.where(k < h, cur.astype(jnp.float32), 0.0)

        acc = jnp.zeros_like(r0)
        for dh, row in ((-1, rm1), (0, r0), (1, rp1)):
            for dw in (-1, 0, 1):
                tap = wv_ref[(dh + 1) * 3 + (dw + 1)].reshape(1, 1, -1)
                acc = acc + _wshift(row, dw) * tap

        gs = gs_ref[0][None]  # [1, B, C]
        ls = ls_ref[0].reshape(1, 1, -1)
        bi = bi_ref[0].reshape(1, 1, -1)
        idv = i_ref[0].astype(jnp.float32)
        y = r0 + acc * gs + ls * idv + bi
        yb = y.astype(y_ref.dtype)
        y_ref[0] = yb

        if with_x1:
            w, b = yb.shape[0], yb.shape[1]
            c = yb.shape[2]
            c1 = x1_ref.shape[3]
            # precision pinned: Mosaic rejects a bf16 lhs under ambient
            # HIGHEST matmul precision; DEFAULT is the measured semantics.
            x1 = jax.lax.dot_general(
                yb.reshape(w * b, c), w1_ref[...],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.DEFAULT,
            )
            x1 = jnp.maximum(x1 + b1_ref[0].reshape(1, c1), 0.0)
            x1_ref[0] = x1.reshape(w, b, c1).astype(x1_ref.dtype)

    # store the current row for the next two programs (after compute reads)
    sprev[k % 2] = cur


def mrla_rowtail(
    out: jax.Array,  # [B, H, W, C] logical — relu(z + identity)
    identity: jax.Array,  # [B, H, W, C]
    gate: jax.Array,  # [B, C] fp32 (mrla_light_gate output)
    wv: jax.Array,  # [3,3,1,C] (or [9,C]) depthwise taps
    lam: jax.Array,  # [C]
    bn_scale: jax.Array,  # [C]
    bn_bias: jax.Array,  # [C]
    w1_next: jax.Array | None = None,  # [1,1,C,C1] or [C,C1]
    b1_next: jax.Array | None = None,  # [C1]
    interpret: bool = False,
):
    """Returns y [B,H,W,C] (and x1 [B,H,W,C1] if w1_next given) in one HBM
    pass over (out, identity)."""
    bsz, h, w, c = out.shape
    with_x1 = w1_next is not None
    gs = gate.astype(jnp.float32) * bn_scale.astype(jnp.float32)[None, :]
    ls = (lam.reshape(-1) * bn_scale.reshape(-1)).astype(jnp.float32)

    ot = jnp.transpose(out, (1, 2, 0, 3))  # [H,W,B,C] == native bytes
    it = jnp.transpose(identity, (1, 2, 0, 3))

    row = lambda ch: pl.BlockSpec(
        (1, w, bsz, ch), lambda k: (jnp.minimum(k, h - 1), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    lag = lambda ch: pl.BlockSpec(
        (1, w, bsz, ch), lambda k: (jnp.maximum(k - 1, 0), 0, 0, 0),
        memory_space=pltpu.VMEM,
    )
    vmem = lambda shape: pl.BlockSpec(
        shape, lambda k: (0,) * len(shape), memory_space=pltpu.VMEM
    )

    in_specs = [row(c), lag(c), vmem((1, bsz, c)), vmem((9, c)),
                vmem((1, c)), vmem((1, c))]
    args = [
        ot, it,
        gs.reshape(1, bsz, c),
        wv.reshape(9, c).astype(jnp.float32),
        ls.reshape(1, c),
        bn_bias.reshape(1, c).astype(jnp.float32),
    ]
    out_specs = [lag(c)]
    out_shape = [jax.ShapeDtypeStruct((h, w, bsz, c), out.dtype)]
    if with_x1:
        w1 = w1_next.reshape(c, -1)
        c1 = w1.shape[1]
        c1p = max(c1, 128)
        if c1p != c1:
            w1 = jnp.pad(w1, ((0, 0), (0, c1p - c1)))
            b1_next = jnp.pad(b1_next.reshape(-1), (0, c1p - c1))
        in_specs += [vmem((c, c1p)), vmem((1, c1p))]
        args += [w1.astype(out.dtype),
                 b1_next.reshape(1, c1p).astype(jnp.float32)]
        out_specs.append(lag(c1p))
        out_shape.append(jax.ShapeDtypeStruct((h, w, bsz, c1p), out.dtype))

    res = pl.pallas_call(
        functools.partial(_rowtail_kernel, with_x1=with_x1),
        grid=(h + 1,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((2, w, bsz, c), out.dtype)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(*args)

    y = jnp.transpose(res[0], (2, 0, 1, 3))
    if not with_x1:
        return y
    x1 = jnp.transpose(res[1], (2, 0, 1, 3))
    if x1.shape[-1] != (w1_next.reshape(c, -1)).shape[1]:
        x1 = x1[..., : w1_next.reshape(c, -1).shape[1]]
    return y, x1
