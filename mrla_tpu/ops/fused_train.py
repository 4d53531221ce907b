"""Fused MRLA-light TRAIN epilogue with a hand-written VJP.

Covers the whole block tail of the flagship family in one custom-vjp op
(reference resnet_mrla_light.py:113-116 with drop_path=0, the published
ResNet recipe):

    m    = dwconv3x3(out)·gate(out) + λ ⊙ id        (bf16, matching the
                                                     module path's dtypes)
    ret  = out + BN_train(m)                        (batch stats, fp32 math)
    also returns (batch_mean, batch_var) for the running-stat update.

Why a custom VJP (VERDICT r2 next-1b): the measured 39 ms/step MRLA
training overhead is bandwidth-bound elementwise + reduction work
(ROADMAP.md training ledger).  Autodiff's backward saves fp32
intermediates of the BN input and scatters its reductions across the
graph; this VJP instead
  * saves only bf16 tensors (out, id, v) + tiny fp32 vectors (gate, GAP,
    mean, var) and recomputes the BN input m from them in the backward,
  * groups EVERY [B,H,W,C] reduction of the backward (dβ, dγ, the two BN
    stat-grad sums, dgate, dλ) into one pass over (dret, v, id) so XLA can
    emit a single multi-output reduce fusion,
  * keeps the depthwise-conv and gate-chain gradients on XLA's native conv
    backward kernels via inner jax.vjp (those are already optimal).

Numerics: forward is bit-identical math to the module path
(MRLALightModule + nn.BatchNorm train mode); backward is mathematically
equal to autodiff with different rounding — asserted against autodiff at
fp32 in tests/test_fused_train.py.

MEASURED VERDICT (round 3, v5e bs128 bf16 224px): 88.4 ms/step vs the
module path's 86.4 — no win, because the step already runs AT the HBM
bandwidth limit (cost model 80.7 GB logical, 70.8 GB actual moved; MXU
roofline only 15.3 ms) and autodiff+XLA were already pass-minimal.  Ships
as a tested off-default (`ResNetMRLALight(fused_epilogue=True)`); full
ledger in ROADMAP.md.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from mrla_tpu.ops.common import channel_conv1d, depthwise_conv3x3, global_avg_pool
from mrla_tpu.ops.mrla import MRLAParams

BN_EPS = 1e-5


def _gate_from_gap(y: jax.Array, wq: jax.Array, wk: jax.Array,
                   heads: int) -> jax.Array:
    """[B, C] fp32 GAP descriptor -> per-head sigmoid gate [B, heads]."""
    b, c = y.shape
    d = c // heads
    q = channel_conv1d(y, wq.astype(jnp.float32)).reshape(b, heads, d)
    k = channel_conv1d(y, wk.astype(jnp.float32)).reshape(b, heads, d)
    return jax.nn.sigmoid(
        jnp.sum(q * k, axis=-1) / jnp.sqrt(jnp.float32(d))
    )  # [B, heads] fp32


def _fwd_math(out, identity, wq, wk, wv, lam, scale, bias, heads):
    b, h, w, c = out.shape
    d = c // heads
    y = global_avg_pool(out)  # [B, C] fp32
    attn = _gate_from_gap(y, wq, wk, heads)  # [B, heads] fp32
    gate = jnp.repeat(attn, d, axis=-1)  # [B, C] fp32
    v = depthwise_conv3x3(out, wv)  # [B,H,W,C] out.dtype
    # module-path dtypes: gate cast to v dtype, λ cast to id dtype
    m = v * gate.astype(v.dtype)[:, None, None, :] + (
        lam.astype(identity.dtype) * identity
    )
    # flax nn.BatchNorm train mode: fp32 stats (biased variance), then the
    # NORMALIZE runs in the module dtype (flax promotes x/mean/var/scale/
    # bias to `dtype` before (x-mean)*rsqrt(var+eps)*scale+bias)
    m32 = m.astype(jnp.float32)
    mean = jnp.mean(m32, axis=(0, 1, 2))
    var = jnp.maximum(
        jnp.mean(jnp.square(m32), axis=(0, 1, 2)) - jnp.square(mean), 0.0
    )
    dt = out.dtype
    # flax op order: mul = rsqrt(var+eps) * scale; y = (x-mean)*mul + bias
    mul = jax.lax.rsqrt(var.astype(dt) + jnp.asarray(BN_EPS, dt)) * (
        scale.astype(dt)
    )
    bn = (m - mean.astype(dt)) * mul + bias.astype(dt)
    ret = out + bn
    return ret, mean, var, (y, attn, gate, v)


@partial(jax.custom_vjp, nondiff_argnums=(8,))
def fused_light_epilogue_train(
    out: jax.Array,
    identity: jax.Array,
    wq: jax.Array,
    wk: jax.Array,
    wv: jax.Array,
    lam: jax.Array,
    scale: jax.Array,
    bias: jax.Array,
    heads: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (ret, batch_mean, batch_var)."""
    ret, mean, var, _ = _fwd_math(out, identity, wq, wk, wv, lam, scale,
                                  bias, heads)
    return ret, mean, var


def _fwd(out, identity, wq, wk, wv, lam, scale, bias, heads):
    ret, mean, var, (y, attn, gate, v) = _fwd_math(
        out, identity, wq, wk, wv, lam, scale, bias, heads
    )
    res = (out, identity, v, y, attn, gate, mean, var, wq, wk, wv, lam, scale)
    return (ret, mean, var), res


def _bwd(heads, res, cots):
    dret, dmean_cot, dvar_cot = cots
    (out, identity, v, y, attn, gate, mean, var, wq, wk, wv, lam,
     scale) = res
    b, h, w, c = out.shape
    d = c // heads
    n = b * h * w

    g32 = dret.astype(jnp.float32)
    rstd = jax.lax.rsqrt(var + BN_EPS)  # [C]
    s32 = scale.astype(jnp.float32)

    # recompute the BN input m from the bf16 residuals, exactly as forward
    m = v * gate.astype(v.dtype)[:, None, None, :] + (
        lam.astype(identity.dtype) * identity
    )
    xhat = (m.astype(jnp.float32) - mean) * rstd  # [B,H,W,C] f32 (fused)

    # ---- the one consolidated reduction pass over (g32, xhat, v, id) ----
    dbeta = jnp.sum(g32, axis=(0, 1, 2))
    dgamma = jnp.sum(g32 * xhat, axis=(0, 1, 2))
    s1 = dbeta / n  # mean of dbn
    s2 = dgamma / n  # mean of dbn·xhat

    dm = (s32 * rstd) * (g32 - s1 - xhat * s2)  # [B,H,W,C] f32

    # cotangents flowing from the (mean, var) outputs (zero in training use,
    # but keep the op a correct primitive): mean/var are fns of m too.
    #   dmean contributes dmean/n per element; dvar contributes
    #   2(m-mean)/n · dvar  (biased variance).
    dm = dm + dmean_cot / n + (2.0 / n) * dvar_cot * (
        m.astype(jnp.float32) - mean
    )

    dv32 = dm * gate[:, None, None, :]
    dgate_bc = jnp.sum(dm * v.astype(jnp.float32), axis=(1, 2))  # [B,C]
    dlam = jnp.sum(dm * identity.astype(jnp.float32), axis=(0, 1, 2))
    did = (dm * lam.astype(jnp.float32)).astype(identity.dtype)

    # depthwise-conv backward on XLA's native conv-grad kernels
    _, conv_pull = jax.vjp(lambda o, w: depthwise_conv3x3(o, w), out, wv)
    dout_conv, dwv = conv_pull(dv32.astype(v.dtype))

    # gate-chain backward (tiny [B,C] work) — also via vjp for exactness
    dattn = jnp.sum(dgate_bc.reshape(b, heads, d), axis=-1)  # [B, heads]

    def gate_fn(y_, wq_, wk_):
        return _gate_from_gap(y_, wq_, wk_, heads)

    _, gate_pull = jax.vjp(gate_fn, y, wq.astype(jnp.float32),
                           wk.astype(jnp.float32))
    dy, dwq, dwk = gate_pull(dattn)

    # GAP backward: uniform spread of dy over H·W
    dout = (
        g32 + dout_conv.astype(jnp.float32)
        + dy[:, None, None, :] / (h * w)
    ).astype(out.dtype)

    return (
        dout,
        did,
        dwq.astype(wq.dtype),
        dwk.astype(wk.dtype),
        dwv.astype(wv.dtype),
        dlam.astype(lam.dtype),
        dgamma.astype(scale.dtype),
        dbeta.astype(scale.dtype),
    )


fused_light_epilogue_train.defvjp(_fwd, _bwd)


def fused_epilogue_module_equivalent(
    out, identity, params: MRLAParams, lam, scale, bias, heads
):
    """Reference composition (module-path math) for tests: returns the same
    (ret, mean, var) triple via plain autodiff-able jnp."""
    from mrla_tpu.ops.mrla import mrla_light_attention

    attn_t = mrla_light_attention(out, params, heads)
    m = attn_t + lam.astype(identity.dtype) * identity
    m32 = m.astype(jnp.float32)
    mean = jnp.mean(m32, axis=(0, 1, 2))
    var = jnp.maximum(
        jnp.mean(jnp.square(m32), axis=(0, 1, 2)) - jnp.square(mean), 0.0
    )
    dt = out.dtype
    mul = jax.lax.rsqrt(var.astype(dt) + jnp.asarray(BN_EPS, dt)) * (
        scale.astype(dt)
    )
    bn = (m - mean.astype(dt)) * mul + bias.astype(dt)
    return out + bn, mean, var
