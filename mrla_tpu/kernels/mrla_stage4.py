"""Stage-resident stage-4 kernel: the 7x7 tail of resnet50_mrlal in ONE
Pallas program with every weight VMEM-resident.

VERDICT round-3 item 3 — the one fusion class the round-1/2/3 kernel
ledger never measured.  Per-block epilogue kernels die at their HBM
boundaries (ROADMAP.md megatail verdict: XLA pipelines activations
through VMEM between fusions, a custom call forces an HBM spill at entry
and exit).  At stage 4 that argument does not apply: the whole stage's
weights (block0 conv3+downsample + blocks 1-2 complete, ~12M params =
24 MB bf16) AND a batch tile's activations (7x7x2048) fit VMEM, so ONE
kernel can run from block0's pre-residual to the stage output C5 with
exactly one activation read and one write against HBM.

Partition (design choice): block0's conv1 (14x14x1024 -> 512) and
stride-2 conv2 stay in XLA — they are dense MXU-bound convs XLA runs at
speed, and keeping them outside makes every in-kernel tensor a clean
[BT·49, C] 2-D matmul operand.  The kernel consumes

    ob  = relu(conv2(relu(conv1(x))))      # [B, 7, 7, 512]
    xs  = x[:, ::2, ::2, :]                # [B, 7, 7, 1024] (downsample taps)

and produces C5 [B, 7, 7, 2048].  In-kernel per batch tile (BT=16):

    z0 = ob @ k3_0; id0 = xs @ kd; y0 = mrla_tail(relu(z0+id0), id0)
    for blocks 1, 2:  x1 = relu(y @ k1); o = relu(conv3x3(x1, k2));
                      z = o @ k3; y = mrla_tail(relu(z+y), y)

where conv3x3 is 9 accumulated [784, 512] @ [512, 512] matmuls over
sublane-rolled views (the flattened [BT·49, C] layout makes a spatial
(dh, dw) shift a single sublane roll by 7·dh+dw with an iota boundary
mask — no W%8 Mosaic relayout pathology because the sublane dim is 784,
not W=7; cf. kernels/mrla_epilogue.py:22-27), and mrla_tail is the
serving epilogue math (kernels/mrla_epilogue.py reference):

    gap  = mean_{hw}(out)                            # [BT, C] f32
    q, k = channel_conv1d(gap, wq/wk)                # lane rolls
    attn = sigmoid(rowsum_per_head(q·k)/sqrt(d))     # [BT, C/d] via one
                                                     # [C, C/d] 0/1 matmul
    gate = attn broadcast per head                   # [BT, C]
    y    = out + (dwconv3x3(out)·gate + λ·id)·bn_scale + bn_bias

Reference math: resnet_mrla_light.py:113-116 (upstream), served by
serving/resnet_mrlal.py:_block — the jnp path is the numerical oracle.
"""

from __future__ import annotations

import functools
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HW = 7
SP = HW * HW  # 49 rows per image


def _roll_mask_spatial(x, dh: int, dw: int, bt: int):
    """Spatial (dh, dw) shifted view of x [BT·49, C] with zero boundary:
    row i holds image pixel (h, w) = (i//7 % 7, i % 7); the shifted view
    holds pixel (h+dh, w+dw) or 0 when outside the 7x7 map.

    Callers MUST pass 32-bit data: Mosaic's tpu.dynamic_rotate is
    unimplemented for non-32-bit vectors (found on-chip in round 5 —
    interpret mode accepts bf16 silently).  The kernel therefore rolls
    the fp32 copies it holds anyway and casts AFTER the roll."""
    if dh == 0 and dw == 0:
        return x
    assert x.dtype.itemsize == 4, (
        f"sublane roll needs 32-bit data on TPU, got {x.dtype}"
    )
    n = x.shape[0]
    s = pltpu.roll(x, (-(dh * HW + dw)) % n, 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    h = (i // HW) % HW
    w = i % HW
    ok = (h + dh >= 0) & (h + dh < HW) & (w + dw >= 0) & (w + dw < HW)
    return jnp.where(ok, s, jnp.zeros_like(s))


def _chan_conv1d(y, taps_ref, row: int, k: int):
    """channel_conv1d (ops/common.py:41) on [BT, C]: k-tap SAME conv
    along the lane axis, taps at taps_ref[row, :k]."""
    c = y.shape[-1]
    pad = (k - 1) // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    out = jnp.zeros_like(y)
    for j in range(k):
        d = j - pad  # tap j reads channel index c+d
        s = pltpu.roll(y, (-d) % c, 1)
        ok = (lane + d >= 0) & (lane + d < c)
        out = out + taps_ref[row, j] * jnp.where(ok, s, jnp.zeros_like(s))
    return out


def _matmul(a, b, out_dtype=jnp.float32):
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(out_dtype)


def _kernel(
    ob_ref,  # [BT, 7, 7, C1]   block0 post-conv2 activation
    xs_ref,  # [BT, 7, 7, CIN]  strided stage input (downsample taps)
    w_ref,   # [WROWS, C]       packed channel-shaped weights (see pack)
    k3_0_ref, kd_ref,           # [C1, C], [CIN, C]
    k1_1_ref, k2_1_ref, k3_1_ref,  # [C, C1], [9·C1, C1], [C1, C]
    k1_2_ref, k2_2_ref, k3_2_ref,
    seg_fwd_ref,  # [C, heads] 0/1 head-sum matrix
    seg_t_ref,    # [heads, C] its transpose (broadcast-back)
    taps_ref,  # [6, KTAP] f32 wq/wk taps per block
    y_ref,   # [BT, 7, 7, C] out
    *, bt: int, heads: int, ktap: int, compute_dtype,
):
    c1 = ob_ref.shape[-1]
    c = y_ref.shape[-1]
    cin = xs_ref.shape[-1]
    n = bt * SP
    d = c // heads
    cd = compute_dtype

    def tail(out_act_f32, identity_f32, blk: int):
        """MRLA-light epilogue; returns y [N, C] f32."""
        # per-image GAP: [N, C] -> [BT, 49, C] -> mean
        gap = jnp.mean(
            out_act_f32.reshape(bt, SP, c), axis=1
        )  # [BT, C] f32
        q = _chan_conv1d(gap, taps_ref, 2 * blk, ktap)
        k = _chan_conv1d(gap, taps_ref, 2 * blk + 1, ktap)
        qk = (q * k).astype(cd)
        head_sum = _matmul(qk, seg_fwd_ref[...].astype(cd))  # [BT, g]
        attn = jax.nn.sigmoid(head_sum / np.sqrt(float(d)))
        gate = _matmul(
            attn.astype(cd), seg_t_ref[...].astype(cd)
        )  # [BT, C] broadcast back to channels
        gate_rows = jnp.broadcast_to(
            gate.reshape(bt, 1, c), (bt, SP, c)
        ).reshape(n, c)

        acc = jnp.zeros((n, c), jnp.float32)
        for dh in (-1, 0, 1):
            for dw in (-1, 0, 1):
                tap = w_ref[3 + 9 * blk + (dh + 1) * 3 + (dw + 1)]
                acc = acc + _roll_mask_spatial(
                    out_act_f32, dh, dw, bt
                ) * tap.astype(jnp.float32).reshape(1, c)
        lam = w_ref[30 + 3 * blk].astype(jnp.float32).reshape(1, c)
        sc = w_ref[31 + 3 * blk].astype(jnp.float32).reshape(1, c)
        bi = w_ref[32 + 3 * blk].astype(jnp.float32).reshape(1, c)
        mrla = acc * gate_rows.astype(jnp.float32) + lam * identity_f32
        return out_act_f32 + mrla * sc + bi

    def conv3x3(x1f, k2_ref, bias_row: int):
        """9 accumulated matmuls over rolled views; x1f [N, C1] fp32
        (rolled in fp32 — see _roll_mask_spatial — then cast to the
        compute dtype for the MXU pass, same rounding as casting before
        the roll)."""
        acc = jnp.zeros((n, c1), jnp.float32)
        for dh in (-1, 0, 1):
            for dw in (-1, 0, 1):
                t = (dh + 1) * 3 + (dw + 1)
                acc = acc + _matmul(
                    _roll_mask_spatial(x1f, dh, dw, bt).astype(cd),
                    k2_ref[t * c1:(t + 1) * c1, :],
                )
        b2 = w_ref[bias_row, :c1].astype(jnp.float32).reshape(1, c1)
        return jnp.maximum(acc + b2, 0.0).astype(cd)

    # ---- block 0 tail ----
    ob = ob_ref[...].reshape(n, c1).astype(cd)
    xs = xs_ref[...].reshape(n, cin).astype(cd)
    z0 = _matmul(ob, k3_0_ref[...]) + w_ref[39].astype(
        jnp.float32).reshape(1, c)
    id0 = _matmul(xs, kd_ref[...]) + w_ref[40].astype(
        jnp.float32).reshape(1, c)
    oa0 = jnp.maximum(z0 + id0, 0.0)
    y = tail(oa0, id0, 0)

    # ---- blocks 1, 2 ----
    for blk, (k1_ref, k2_ref, k3_ref) in enumerate(
        ((k1_1_ref, k2_1_ref, k3_1_ref), (k1_2_ref, k2_2_ref, k3_2_ref)),
        start=1,
    ):
        yb = y.astype(cd)
        x1f = jnp.maximum(
            _matmul(yb, k1_ref[...])
            + w_ref[41 + (blk - 1), :c1].astype(
                jnp.float32).reshape(1, c1),
            0.0,
        )
        o = conv3x3(x1f, k2_ref, 43 + (blk - 1))
        z = _matmul(o, k3_ref[...]) + w_ref[
            45 + (blk - 1)].astype(jnp.float32).reshape(1, c)
        oa = jnp.maximum(z + y, 0.0)
        y = tail(oa, y, blk)

    y_ref[...] = y.reshape(bt, HW, HW, c).astype(y_ref.dtype)


def pack_stage4_params(blocks: Sequence[Dict], dtype=jnp.bfloat16,
                       dim_perhead: int = 32):
    """blocks: the three stage-4 entries of the serving param tree
    (serving/resnet_mrlal.py:prepare_inference_params) — [b0, b1, b2].
    Row layout of the packed [48, C] channel-param array: 3+9b..11+9b
    wv taps of block b; 30/31/32+3b lam/bn_scale/bn_bias; 39 b3_0;
    40 bd; 41+i/43+i/45+i b1/b2/b3 of block 1+i (C1-wide rows padded).
    Returns the operand dict for :func:`stage4_resident`."""
    b0, b1, b2 = blocks
    c = np.asarray(b0["k3"]).shape[-1]
    c1 = np.asarray(b0["k3"]).shape[-2]
    cin = np.asarray(b0["kd"]).shape[-2]
    heads = c // dim_perhead  # reference: heads = C/dim_perhead (ADVICE r4)

    w = np.zeros((48, c), np.float32)
    for blk, p in enumerate((b0, b1, b2)):
        wv = np.asarray(p["wv"], np.float32).reshape(9, c)
        # dwconv taps: 9 rows per block at 3 + 9·blk
        w[3 + 9 * blk:12 + 9 * blk] = wv
        w[30 + 3 * blk] = np.asarray(p["lam"], np.float32).reshape(c)
        w[31 + 3 * blk] = np.asarray(p["bn_scale"], np.float32)
        w[32 + 3 * blk] = np.asarray(p["bn_bias"], np.float32)
    w[39] = np.asarray(b0["b3"], np.float32)
    w[40] = np.asarray(b0["bd"], np.float32)
    for i, p in enumerate((b1, b2)):
        w[41 + i, :c1] = np.asarray(p["b1"], np.float32)
        w[43 + i, :c1] = np.asarray(p["b2"], np.float32)
        w[45 + i] = np.asarray(p["b3"], np.float32)

    seg = np.zeros((c, heads), np.float32)
    d = c // heads
    for h in range(heads):
        seg[h * d:(h + 1) * d, h] = 1.0

    ktap = int(np.asarray(b0["wq"]).shape[-1])
    taps = np.zeros((6, ktap), np.float32)
    for blk, p in enumerate((b0, b1, b2)):
        taps[2 * blk] = np.asarray(p["wq"], np.float32).reshape(-1)
        taps[2 * blk + 1] = np.asarray(p["wk"], np.float32).reshape(-1)

    def k2pack(p):
        k2 = np.asarray(p["k2"], np.float32)  # [3, 3, C1, C1]
        return k2.reshape(9 * c1, c1)

    return dict(
        w=jnp.asarray(w, jnp.float32),
        k3_0=jnp.asarray(np.asarray(b0["k3"]).reshape(c1, c), dtype),
        kd=jnp.asarray(np.asarray(b0["kd"]).reshape(cin, c), dtype),
        k1_1=jnp.asarray(np.asarray(b1["k1"]).reshape(c, c1), dtype),
        k2_1=jnp.asarray(k2pack(b1), dtype),
        k3_1=jnp.asarray(np.asarray(b1["k3"]).reshape(c1, c), dtype),
        k1_2=jnp.asarray(np.asarray(b2["k1"]).reshape(c, c1), dtype),
        k2_2=jnp.asarray(k2pack(b2), dtype),
        k3_2=jnp.asarray(np.asarray(b2["k3"]).reshape(c1, c), dtype),
        seg=jnp.asarray(seg, dtype),
        seg_t=jnp.asarray(seg.T.copy(), dtype),
        taps=jnp.asarray(taps, jnp.float32),
        heads=heads,
        ktap=ktap,
    )


@functools.partial(
    jax.jit, static_argnames=("heads", "ktap", "batch_tile", "interpret")
)
def stage4_resident(
    ob: jax.Array,   # [B, 7, 7, C1]
    xs: jax.Array,   # [B, 7, 7, CIN]
    packed: Dict,
    heads: int,
    ktap: int,
    batch_tile: int = 16,
    interpret: bool = False,
) -> jax.Array:
    b = ob.shape[0]
    c1 = ob.shape[-1]
    cin = xs.shape[-1]
    c = packed["k3_0"].shape[-1]
    bt = min(batch_tile, b)
    assert b % bt == 0 and bt * SP % 8 == 0
    cd = packed["k3_0"].dtype

    full = lambda shp: pl.BlockSpec(
        shp, lambda i: (0,) * len(shp), memory_space=pltpu.VMEM
    )
    grid_spec = pl.GridSpec(
        grid=(b // bt,),
        in_specs=[
            pl.BlockSpec((bt, HW, HW, c1), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bt, HW, HW, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full(packed["w"].shape),
            full(packed["k3_0"].shape),
            full(packed["kd"].shape),
            full(packed["k1_1"].shape),
            full(packed["k2_1"].shape),
            full(packed["k3_1"].shape),
            full(packed["k1_2"].shape),
            full(packed["k2_2"].shape),
            full(packed["k3_2"].shape),
            full(packed["seg"].shape),
            full(packed["seg_t"].shape),
            full(packed["taps"].shape),
        ],
        out_specs=pl.BlockSpec((bt, HW, HW, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(
            _kernel, bt=bt, heads=heads, ktap=ktap, compute_dtype=cd
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, HW, HW, c), ob.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        ob, xs, packed["w"], packed["k3_0"], packed["kd"],
        packed["k1_1"], packed["k2_1"], packed["k3_1"],
        packed["k1_2"], packed["k2_2"], packed["k3_2"],
        packed["seg"], packed["seg_t"], packed["taps"],
    )
