"""Functional MRLA attention variants (NHWC, pure jax.numpy).

These are the reference oracles for the Pallas kernels and the compute bodies
of the Flax modules.  Math parity (verified by golden tests vs independent
torch oracles):

  * MRLA-light (paper eq. 8): per-head SIGMOID gate on a single-position
    Q·K dot, then a λ-gated recurrence handled by the caller.
    Reference behavior: /root/reference/resnet/models/modules/mrla_light_module.py:52-74.
  * MRLA-base (paper eq. 6): growing K/V cache over the layer axis t,
    SOFTMAX over t.  Reference: .../mrla_base_module.py:54-89.
  * LA eq. 4: non-recurrent full layer attention recomputing K, V from the
    stacked context each layer.  Reference: .../la_module.py:54-78.

TPU-first design: the layer axis t is tiny (<= 23), so attention over t is a
VPU-side reduction; the FLOP-heavy piece is the depthwise value projection,
which XLA maps to a fused depthwise conv.  Everything keeps static shapes —
t is a Python int per call site, so jit unrolls the depth recurrence into a
feed-forward graph.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mrla_tpu.ops.common import channel_conv1d, depthwise_conv3x3, global_avg_pool


class MRLAParams(NamedTuple):
    """Weights of one MRLA attention layer (shared across variants).

    wq, wk: [k] 1-D taps over the channel axis (bias-free).
    wv:     [3, 3, 1, C] HWIO depthwise value kernel.
    """

    wq: jax.Array
    wk: jax.Array
    wv: jax.Array


def _qk_logits(x: jax.Array, params: MRLAParams, heads: int) -> tuple[jax.Array, jax.Array]:
    """Compute per-head Q and K vectors from the GAP descriptor.

    Returns (q, k) each [B, g, d] in float32, where g=heads and d=C/heads.
    """
    b = x.shape[0]
    c = x.shape[-1]
    d = c // heads
    y = global_avg_pool(x)  # [B, C] fp32
    wq = params.wq.astype(jnp.float32)
    wk = params.wk.astype(jnp.float32)
    q = channel_conv1d(y, wq).reshape(b, heads, d)
    k = channel_conv1d(y, wk).reshape(b, heads, d)
    return q, k


def mrla_light_attention(
    x: jax.Array,
    params: MRLAParams,
    heads: int,
    act_v=None,
) -> jax.Array:
    """MRLA-light attention: sigmoid(Q·K/√d) gating a depthwise-conv value.

    Args:
      x: [B, H, W, C] post-residual block output.
      params: MRLA weights.
      heads: number of heads g (C divisible by g).
      act_v: optional activation applied to V before gating (the DeiT variant
        inserts GELU here, /root/reference/deit/deit_mrla_light.py:167).

    Returns:
      [B, H, W, C] gated value map (the caller adds λ ⊙ o_{t-1}).
    """
    b, h, w, c = x.shape
    d = c // heads
    q, k = _qk_logits(x, params, heads)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    attn = jax.nn.sigmoid(jnp.sum(q * k, axis=-1) * scale)  # [B, g] fp32
    v = depthwise_conv3x3(x, params.wv)  # [B, H, W, C]
    if act_v is not None:
        v = act_v(v)
    gate = jnp.repeat(attn, d, axis=-1).astype(v.dtype)  # [B, C] head-broadcast
    return v * gate[:, None, None, :]


class MRLACache(NamedTuple):
    """Growing per-stage K/V cache of MRLA-base.

    k: [B, t, C]         — per-layer key descriptors.
    v: [B, t, H, W, C]   — per-layer full value maps (the memory hot spot;
                           see SURVEY.md §3.3).
    """

    k: jax.Array
    v: jax.Array


def mrla_base_attention(
    x: jax.Array,
    params: MRLAParams,
    heads: int,
    cache: MRLACache | None,
) -> tuple[jax.Array, MRLACache]:
    """MRLA-base attention: softmax over the layer axis t against a growing
    K/V cache.  ``cache=None`` starts a fresh stage (init_cell semantics,
    /root/reference/resnet/models/resnet_mrla_base.py:44-51).

    Returns (out [B,H,W,C], new cache with this layer appended).
    """
    b, h, w, c = x.shape
    d = c // heads
    q, k_t = _qk_logits(x, params, heads)  # [B,g,d] fp32
    v_t = depthwise_conv3x3(x, params.wv)  # [B,H,W,C]

    if cache is None:
        k_all = k_t.reshape(b, 1, c)
        v_all = v_t[:, None]  # [B,1,H,W,C]
    else:
        k_all = jnp.concatenate([cache.k, k_t.reshape(b, 1, c)], axis=1)
        v_all = jnp.concatenate([cache.v, v_t[:, None]], axis=1)
    new_cache = MRLACache(k=k_all, v=v_all)

    t = k_all.shape[1]
    kh = k_all.astype(jnp.float32).reshape(b, t, heads, d)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    # logits over the layer axis: [B, g, t]
    logits = jnp.einsum("bgd,btgd->bgt", q, kh) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    # Weighted sum of the cached value maps per head group.
    vh = v_all.reshape(b, t, h, w, heads, d)
    out = jnp.einsum("bgt,bthwgd->bhwgd", attn.astype(v_all.dtype), vh)
    return out.reshape(b, h, w, c), new_cache


def mrla_base_attention_fixed(
    x: jax.Array,
    params: MRLAParams,
    heads: int,
    k_buf: jax.Array,
    v_buf: jax.Array,
    t: jax.Array,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """MRLA-base step against FIXED-SIZE cache buffers (the lax.scan form).

    Instead of growing [B, t, ...] concatenations (which force jit to unroll
    the depth loop with t-specific shapes), the cache is preallocated at the
    stage's max depth and masked: positions > t contribute -inf logits.
    Numerically identical to mrla_base_attention (golden-tested).

    Args:
      x: [B, H, W, C] current block output.
      k_buf: [B, T_max, C]; v_buf: [B, T_max, H, W, C] — zero-initialized.
      t: scalar int32, number of cached layers BEFORE this one (0-based
         write index for this layer's k/v).

    Returns (out, new_k_buf, new_v_buf); caller increments t.
    """
    b, h, w, c = x.shape
    t_max = k_buf.shape[1]
    d = c // heads
    q, k_t = _qk_logits(x, params, heads)  # [B,g,d] fp32
    v_t = depthwise_conv3x3(x, params.wv)  # [B,H,W,C]

    k_buf = jax.lax.dynamic_update_slice_in_dim(
        k_buf, k_t.reshape(b, 1, c).astype(k_buf.dtype), t, axis=1
    )
    v_buf = jax.lax.dynamic_update_slice_in_dim(
        v_buf, v_t[:, None].astype(v_buf.dtype), t, axis=1
    )

    kh = k_buf.astype(jnp.float32).reshape(b, t_max, heads, d)
    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum("bgd,btgd->bgt", q, kh) * scale  # [B,g,T_max]
    mask = jnp.arange(t_max) <= t  # this layer included
    logits = jnp.where(mask[None, None, :], logits, -jnp.inf)
    attn = jax.nn.softmax(logits, axis=-1)
    vh = v_buf.reshape(b, t_max, h, w, heads, d)
    out = jnp.einsum("bgt,bthwgd->bhwgd", attn.astype(v_buf.dtype), vh)
    return out.reshape(b, h, w, c), k_buf, v_buf


def la_eq4_attention(
    x: jax.Array,
    ctx: jax.Array,
    params: MRLAParams,
    heads: int,
) -> jax.Array:
    """LA (paper eq. 4): recompute K, V from the full stacked context each
    layer — the non-recurrent ablation.  Reference .../la_module.py:54-78.

    Args:
      x: [B, H, W, C] current layer features (query source).
      ctx: [B, t, H, W, C] stacked features of layers 1..t.

    Returns [B, H, W, C].
    """
    b, t, h, w, c = ctx.shape
    d = c // heads
    y = global_avg_pool(x)  # [B, C]
    wq = params.wq.astype(jnp.float32)
    wk = params.wk.astype(jnp.float32)
    q = channel_conv1d(y, wq).reshape(b, heads, d)

    ctx_flat = ctx.reshape(b * t, h, w, c)
    yk = global_avg_pool(ctx_flat)  # [B*t, C]
    k = channel_conv1d(yk, wk).reshape(b, t, heads, d)
    v = depthwise_conv3x3(ctx_flat, params.wv).reshape(b, t, h, w, heads, d)

    scale = 1.0 / jnp.sqrt(jnp.float32(d))
    logits = jnp.einsum("bgd,btgd->bgt", q, k) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bgt,bthwgd->bhwgd", attn.astype(v.dtype), v)
    return out.reshape(b, h, w, c)
