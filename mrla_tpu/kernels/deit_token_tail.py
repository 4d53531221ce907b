"""Fused DeiT MRLA token-tail kernel (round-5 VERDICT item 3).

The round-5 decomposition ledger (scripts/exp_deit_decomp.py) pinned the
deit_mrlal serving gap: the MRLA token tail costs 4.73 ms of the
21.79 ms bs128/mb16 step (~22%) while doing only 2.3 GFLOP at ~0% MXU —
pure barrier/elementwise work (2 LayerNorms, GAP, two 5-tap channel
convs, sigmoid head gate, depthwise 3x3, λ-weighted add, cls
split/concat) whose minimum HBM traffic is ~3 reads+1 write of the
[B, 197, C] activations.  This kernel runs the ENTIRE tail (module
semantics of models/deit_mrla.py:MRLALightTokenModule, including the
block's residual add) in one Pallas program per microbatch chain.

Layout: grid tokens flatten to [B·196, C] (8-aligned sublanes — 196
rows per image, image-crossing neighbor taps masked by the 14x14 h/w
bounds exactly like kernels/mrla_stage4.py's 7x7 rolls).  The cls row
is a separate [B, C] operand: its tail output is just normx(cls)
(reference quirk: the cls token bypasses MRLA but the NORMALIZED cls is
what passes through — /root/reference/deit/deit_mrla_light.py:199-207).
Per-image GAP and the head-gate broadcast are two tiny iota-built
matmuls ([B, R]@[R, C] and [R, B]@[B, C]).  All rolls on fp32 (Mosaic's
dynamic_rotate is 32-bit-only — the round-5 stage-4 lesson).

Semantics (jnp oracle = the flax module):

    normx = LN_x(x); normo = LN_o(ot)                    # eps 1e-6
    gap   = mean_grid(normx_grid)                        # fp32
    q, k  = conv1d_ktap(gap, wq/wk)
    attn  = sigmoid(rowsum_per_head(q*k)/sqrt(d))        # d = dim_perhead
    v     = gelu_exact(dwconv3x3(normx_grid))            # GELU-on-V quirk
    out_grid = x_grid + v*gate + lam*normo_grid
    out_cls  = x_cls + normx_cls
"""

from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S = 14  # token grid side (196 = 14x14 grid tokens + 1 cls)


def _erf(x):
    """Abramowitz & Stegun 7.1.26 rational erf (max abs error 1.5e-7 —
    far below bf16 output resolution).  Mosaic has no erf primitive
    (NotImplementedError found on-chip round 5); this uses only exp."""
    a1, a2, a3 = 0.254829592, -0.284496736, 1.421413741
    a4, a5, p = -1.453152027, 1.061405429, 0.3275911
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + p * ax)
    poly = ((((a5 * t + a4) * t + a3) * t + a2) * t + a1) * t
    y = 1.0 - poly * jnp.exp(-ax * ax)
    return jnp.sign(x) * y


def _ln(v32, scale, bias, eps=1e-6):
    m = jnp.mean(v32, axis=-1, keepdims=True)
    d = v32 - m
    var = jnp.mean(d * d, axis=-1, keepdims=True)
    return d * jax.lax.rsqrt(var + eps) * scale + bias


def _roll_mask_grid(x32, dh: int, dw: int, n_tok: int):
    """(dh, dw)-shifted view of x32 [B·n_tok, C] fp32 with zero
    boundary.  Row i is image i//n_tok, row-in-image r = i % n_tok;
    r = 0 is the cls row (excluded), grid cell (h, w) =
    ((r-1) // 14 % 14, (r-1) % 14).  Because grid rows are contiguous
    within an image, the spatial neighbor (h+dh, w+dw) sits at flat
    offset dh·14+dw — one sublane roll; positions whose neighbor falls
    off the 14x14 map (or that are cls rows) are zeroed."""
    if dh == 0 and dw == 0:
        return x32
    n = x32.shape[0]
    s = pltpu.roll(x32, (-(dh * S + dw)) % n, 0)
    i = jax.lax.broadcasted_iota(jnp.int32, (n, 1), 0)
    r = i % n_tok
    t = r - 1
    h = (t // S) % S
    w = t % S
    ok = (
        (r >= 1)
        & (h + dh >= 0) & (h + dh < S)
        & (w + dw >= 0) & (w + dw < S)
    )
    return jnp.where(ok, s, jnp.zeros_like(s))


def _chan_conv1d(y32, taps_ref, row: int, k: int):
    """k-tap SAME cross-correlation along the lane axis of y32 [B, C]."""
    c = y32.shape[-1]
    pad = (k - 1) // 2
    lane = jax.lax.broadcasted_iota(jnp.int32, y32.shape, 1)
    out = jnp.zeros_like(y32)
    for j in range(k):
        d = j - pad
        s = pltpu.roll(y32, (-d) % c, 1)
        ok = (lane + d >= 0) & (lane + d < c)
        out = out + taps_ref[row, j] * jnp.where(ok, s, jnp.zeros_like(s))
    return out


def _kernel(
    x_ref,    # [B·N, C] all tokens of x (post-MLP block output)
    o_ref,    # [B·N, C] all tokens of ot (block input)
    w_ref,    # [16, C] fp32 channel params (see pack)
    taps_ref,  # [2, K] fp32 wq/wk taps
    out_ref,
    *, b: int, heads: int, ktap: int,
):
    r, c = x_ref.shape
    d = c // heads
    n_tok = r // b  # 197: cls + 196 grid rows, contiguous per image

    x32 = x_ref[...].astype(jnp.float32)
    o32 = o_ref[...].astype(jnp.float32)
    normx = _ln(x32, w_ref[0].reshape(1, c), w_ref[1].reshape(1, c))
    normo = _ln(o32, w_ref[2].reshape(1, c), w_ref[3].reshape(1, c))

    # per-image GAP over GRID rows only: [B, R] 0/1 matmul (iota-built)
    col = jax.lax.broadcasted_iota(jnp.int32, (b, r), 1)
    bi = col // n_tok
    is_grid_col = (col % n_tok) >= 1
    sel = (
        (bi == jax.lax.broadcasted_iota(jnp.int32, (b, r), 0)) & is_grid_col
    ).astype(jnp.float32)
    gap = jax.lax.dot_general(
        sel, normx, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * (1.0 / (n_tok - 1))  # [B, C]

    q = _chan_conv1d(gap, taps_ref, 0, ktap)
    k = _chan_conv1d(gap, taps_ref, 1, ktap)
    qk = q * k
    # per-head row-sum via [C, heads] 0/1 matmul
    lane_h = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0) // d
    seg = (lane_h == jax.lax.broadcasted_iota(
        jnp.int32, (c, heads), 1)).astype(jnp.float32)
    hs = jax.lax.dot_general(
        qk, seg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, heads]
    attn = jax.nn.sigmoid(hs / np.sqrt(float(d)))
    gate = jax.lax.dot_general(
        attn, seg.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [B, C]
    # broadcast per-image gate back to rows: [R, B] @ [B, C] (the image
    # selector without the grid mask — cls rows get a gate value too but
    # their output is overridden below)
    selb = (
        jax.lax.broadcasted_iota(jnp.int32, (r, b), 0) // n_tok
        == jax.lax.broadcasted_iota(jnp.int32, (r, b), 1)
    ).astype(jnp.float32)
    gate_rows = jax.lax.dot_general(
        selb, gate, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [R, C]

    # depthwise 3x3 on the 14x14 grid + exact GELU (GELU-on-V quirk)
    acc = jnp.zeros((r, c), jnp.float32)
    for dh in (-1, 0, 1):
        for dw in (-1, 0, 1):
            tap = w_ref[5 + (dh + 1) * 3 + (dw + 1)].reshape(1, c)
            acc = acc + _roll_mask_grid(normx, dh, dw, n_tok) * tap
    v = 0.5 * acc * (1.0 + _erf(acc * np.float32(1.0 / np.sqrt(2.0))))

    lam = w_ref[4].reshape(1, c)
    # grid rows: x + v·gate + λ·normo; cls rows: x + normx (the bypass
    # passes the NORMALIZED cls through — deit_mrla_light.py:199-207)
    i = jax.lax.broadcasted_iota(jnp.int32, (r, 1), 0)
    is_grid = (i % n_tok) >= 1
    mrla = v * gate_rows + lam * normo
    out_ref[...] = (
        x32 + jnp.where(is_grid, mrla, normx)
    ).astype(out_ref.dtype)


def pack_tail_params(p: Dict, dtype=jnp.float32):
    """p: {'ln_x_scale','ln_x_bias','ln_o_scale','ln_o_bias','lam' [C],
    'wv' [3,3,1,C] HWIO, 'wq','wk' [K]} -> (w [16, C] f32, taps [2, K] f32).
    Row layout: 0..3 LN scale/bias x/o; 4 lam; 5..13 wv taps in
    (dh+1)*3+(dw+1) order."""
    c = np.asarray(p["ln_x_scale"]).shape[-1]
    w = np.zeros((16, c), np.float32)
    w[0] = np.asarray(p["ln_x_scale"], np.float32)
    w[1] = np.asarray(p["ln_x_bias"], np.float32)
    w[2] = np.asarray(p["ln_o_scale"], np.float32)
    w[3] = np.asarray(p["ln_o_bias"], np.float32)
    w[4] = np.asarray(p["lam"], np.float32)
    w[5:14] = np.asarray(p["wv"], np.float32).reshape(9, c)
    taps = np.stack([
        np.asarray(p["wq"], np.float32), np.asarray(p["wk"], np.float32)
    ])
    return jnp.asarray(w), jnp.asarray(taps)


@functools.partial(
    jax.jit, static_argnames=("dim_perhead", "interpret")
)
def deit_token_tail(
    x: jax.Array,
    ot: jax.Array,
    w: jax.Array,
    taps: jax.Array,
    dim_perhead: int = 16,
    interpret: bool = False,
) -> jax.Array:
    """x, ot: [B, N, C] (N = 1 + 14·14); returns
    x + MRLALightTokenModule(x, ot) with packed params (pack_tail_params).
    """
    b, n, c = x.shape
    assert n == S * S + 1, n
    r = b * n
    assert r % 8 == 0, "flat token rows must be 8-aligned"
    heads = c // dim_perhead
    ktap = int(taps.shape[-1])

    # the FULL token rows, cls included — [B, N, C] -> [B·N, C] is a
    # free contiguous reshape, so the kernel boundary adds NO slice or
    # concat copies (the v1 grid-only layout paid 3 extra HBM copies per
    # call and measured a tie; this layout is the pure fusion)
    out = pl.pallas_call(
        functools.partial(_kernel, b=b, heads=heads, ktap=ktap),
        grid=(),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(x.reshape(r, c), ot.reshape(r, c), w, taps)
    return out.reshape(b, n, c)


def extract_tail_params(block_params: Dict) -> Dict:
    """Pull the tail's weights out of a flax MRLAViTBlock param subtree
    (variables['params']['blockN']) into pack_tail_params form."""
    m = block_params["mrla"]
    return {
        "ln_x_scale": m["normx"]["scale"],
        "ln_x_bias": m["normx"]["bias"],
        "ln_o_scale": m["normo"]["scale"],
        "ln_o_bias": m["normo"]["bias"],
        "lam": m["lambda_t"],
        "wv": m["mrla"]["proj"]["wv"],
        "wq": m["mrla"]["proj"]["wq"],
        "wk": m["mrla"]["proj"]["wk"],
    }
