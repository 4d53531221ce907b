"""Fused MRLA-light block epilogue as a Pallas TPU kernel.

Replaces the ~8-op tail of every MRLA bottleneck (reference
resnet_mrla_light.py:116 — GAP, conv1d Q, conv1d K, per-head dot+sigmoid,
depthwise-3x3 V, gate-mul, λ-mul-add, BN-affine, residual add):

    y = out + (dwconv3x3(out) * sigmoid(Q(GAP)·K(GAP)/√d)[head]
               + λ ⊙ identity) * bn_scale + bn_bias

Two-phase TPU design:
  1. The attention gate (GAP -> k-tap channel convs -> per-head sigmoid) is
     a [B, C] vector — left in jnp, where XLA fuses it into a single
     reduction pass over `out`.
  2. Everything that touches full feature maps — depthwise 3x3, gate-mul,
     λ-mul-add, BN affine, residual add — runs in ONE Pallas kernel over a
     (batch, channel-tile) grid.  Depthwise conv is channel-independent, so
     channel tiling needs no halo; each program holds a [H, W, CT] block in
     VMEM and does 9 shifted FMAs.

HBM traffic: 4 full-map passes (gate read + kernel read out/id + write)
vs ~7 for the unfused XLA chain.

Inference form: bn_scale = γ/√(var+ε), bn_bias = β − mean·bn_scale,
precomputed by the caller.  Training uses the jnp reference path
(`mrla_light_epilogue_reference`), which is also the test oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mrla_tpu.ops.common import channel_conv1d, depthwise_conv3x3

CHANNEL_TILE = 128


def mrla_light_gate(
    out: jax.Array, wq: jax.Array, wk: jax.Array, heads: int
) -> jax.Array:
    """Per-channel sigmoid gate [B, C] (head value broadcast to its channels)."""
    b, _, _, c = out.shape
    d = c // heads
    y = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # [B, C]
    q = channel_conv1d(y, wq.astype(jnp.float32)).reshape(b, heads, d)
    k = channel_conv1d(y, wk.astype(jnp.float32)).reshape(b, heads, d)
    attn = jax.nn.sigmoid(jnp.sum(q * k, -1) / jnp.sqrt(jnp.float32(d)))  # [B, g]
    return jnp.repeat(attn, d, axis=-1)  # [B, C] fp32


def mrla_light_epilogue_reference(
    out: jax.Array,
    identity: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    lam: jax.Array,
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    heads: int,
) -> jax.Array:
    """jnp oracle: exactly the math of the fused path."""
    gate = mrla_light_gate(out, wq, wk, heads)
    v = depthwise_conv3x3(out, wv)
    mrla = v.astype(jnp.float32) * gate[:, None, None, :] + lam.astype(
        jnp.float32
    ) * identity.astype(jnp.float32)
    y = out.astype(jnp.float32) + mrla * bn_scale + bn_bias
    return y.astype(out.dtype)


def _epilogue_kernel(
    out_ref,  # [1, H, W, CT] VMEM
    id_ref,  # [1, H, W, CT] VMEM
    gate_ref,  # [1, 1, CT]
    wv_ref,  # [9, CT]
    lam_ref,  # [1, CT]
    scale_ref,  # [1, CT]
    bias_ref,  # [1, CT]
    y_ref,  # [1, H, W, CT]
):
    x = out_ref[0]  # [H, W, CT] bf16
    h, w, ct = x.shape

    # depthwise 3x3: 9 shifted FMAs over the zero-padded resident block,
    # fp32 accumulation on the VPU.
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    v = jnp.zeros((h, w, ct), jnp.float32)
    for i in range(3):
        for j in range(3):
            tap = wv_ref[i * 3 + j].astype(jnp.float32).reshape(1, 1, ct)
            v = v + tap * xp[i : i + h, j : j + w, :].astype(jnp.float32)

    gate = gate_ref[0, 0].astype(jnp.float32).reshape(1, 1, ct)
    lam = lam_ref[0].astype(jnp.float32).reshape(1, 1, ct)
    scale = scale_ref[0].astype(jnp.float32).reshape(1, 1, ct)
    bias = bias_ref[0].astype(jnp.float32).reshape(1, 1, ct)
    mrla = v * gate + lam * id_ref[0].astype(jnp.float32)
    y_ref[0] = (x.astype(jnp.float32) + mrla * scale + bias).astype(y_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads",))
def mrla_light_epilogue_pallas(
    out: jax.Array,
    identity: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    lam: jax.Array,
    bn_scale: jax.Array,
    bn_bias: jax.Array,
    heads: int,
) -> jax.Array:
    """Fused epilogue.  Shapes: out/identity [B,H,W,C]; wq/wk [k]; wv
    [3,3,1,C]; lam/bn_scale/bn_bias [C].  Returns [B,H,W,C] in out.dtype."""
    b, h, w, c = out.shape
    ct = min(CHANNEL_TILE, c)
    assert c % ct == 0

    gate = mrla_light_gate(out, wq, wk, heads)  # [B, C] fp32 (jnp phase)
    wv_flat = wv.reshape(9, c).astype(jnp.float32)
    row = lambda a: a.reshape(1, c).astype(jnp.float32)

    grid = (b, c // ct)
    map_spec = pl.BlockSpec(
        (1, h, w, ct), lambda i, j: (i, 0, 0, j), memory_space=pltpu.VMEM
    )
    vec_spec = lambda rows: pl.BlockSpec(
        (rows, ct), lambda i, j: (0, j), memory_space=pltpu.VMEM
    )
    gate_spec = pl.BlockSpec(
        (1, 1, ct), lambda i, j: (i, 0, j), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        _epilogue_kernel,
        grid=grid,
        in_specs=[
            map_spec,
            map_spec,
            gate_spec,
            vec_spec(9),
            vec_spec(1),
            vec_spec(1),
            vec_spec(1),
        ],
        out_specs=map_spec,
        out_shape=jax.ShapeDtypeStruct(out.shape, out.dtype),
    )(
        out,
        identity,
        gate.reshape(b, 1, c),
        wv_flat,
        row(lam),
        row(bn_scale),
        row(bn_bias),
    )
