"""Linear layer attention with O(1) running state (Katharopoulos-style).

Reference behavior: /root/reference/resnet/models/modules/linear_la.py —
three granularities of the same recurrence over the layer axis:

    s <- s + φ(K)ᵀ V        (running KV summary)
    z <- z + φ(K)           (running normalizer)
    out = (φ(Q) s) / (φ(Q) (z + eps))

with φ(x) = elu(x) + 1 by default (feature_map.py:58-60).

TPU-first: state tensors are per-image matmuls (batched einsums on the MXU);
the full-rank variant's s is [B, C, C·H·W] which is enormous — kept for parity
with the reference, but linear_gla/linear_cla are the practical forms.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from mrla_tpu.ops.common import channel_conv1d, depthwise_conv3x3, global_avg_pool
from mrla_tpu.ops.mrla import MRLAParams


def elu_feature_map(x: jax.Array) -> jax.Array:
    return jax.nn.elu(x) + 1.0


def _qkv(x: jax.Array, params: MRLAParams, phi: Callable):
    """Shared Q/K/V front-end of all linear-LA variants. Returns fp32 q, k
    ([B, C]) with φ applied, and v ([B, H, W, C]) in the input dtype."""
    y = global_avg_pool(x)  # [B, C] fp32
    q = phi(channel_conv1d(y, params.wq.astype(jnp.float32)))
    k = phi(channel_conv1d(y, params.wk.astype(jnp.float32)))
    v = depthwise_conv3x3(x, params.wv)
    return q, k, v


def svd_compress(s: jax.Array, rank: int | None = None):
    """Factorize the running state s [B, C, D] -> (u, sig, vh).

    Reference LinearLayerAttention(svd=True) stores s between layers as a
    reduced SVD (linear_la.py:86-105: reconstruct u·diag(σ)·vᵀ on entry,
    torch.svd(some=True) on exit).  `rank` additionally truncates to the
    top-k singular triples (rank-k compression of the state); None keeps
    the reference's reduced (full-rank) factorization.
    """
    u, sig, vh = jnp.linalg.svd(s, full_matrices=False)
    if rank is not None:
        u, sig, vh = u[..., :rank], sig[..., :rank], vh[..., :rank, :]
    return u, sig, vh


def svd_reconstruct(fac) -> jax.Array:
    """Inverse of svd_compress: (u, sig, vh) -> u·diag(σ)·vh."""
    u, sig, vh = fac
    return jnp.einsum("...ck,...k,...kd->...cd", u, sig, vh)


def linear_la_step(
    x: jax.Array,
    s,
    z: jax.Array | None,
    params: MRLAParams,
    phi: Callable = elu_feature_map,
    eps: float = 1e-6,
    svd: bool = False,
    svd_rank: int | None = None,
):
    """Full-rank linear layer attention step (reference LinearLayerAttention).

    State: s [B, C, C*H*W], z [B, C].  Pass s=z=None to start the recurrence.
    With svd=True the state is carried FACTORIZED as (u, sig, vh)
    (linear_la.py:86-105) — reconstructed before the update and re-factorized
    (optionally truncated to svd_rank) after.  Returns (out [B,H,W,C], s, z).
    """
    b, h, w, c = x.shape
    q, k, v = _qkv(x, params, phi)
    vf = v.astype(jnp.float32).reshape(b, c * h * w)
    kv = jnp.einsum("bc,bd->bcd", k, vf)  # [B, C, CHW]
    if svd and s is not None:
        s = svd_reconstruct(s)
    s = kv if s is None else s + kv
    z = k if z is None else z + k
    qz = 1.0 / jnp.einsum("bc,bc->b", q, z + eps)  # [B]
    out = jnp.einsum("bc,bcd,b->bd", q, s, qz)
    if svd:
        s = svd_compress(s, svd_rank)
    return out.reshape(b, h, w, c).astype(x.dtype), s, z


def linear_cla_step(
    x: jax.Array,
    s: jax.Array | None,
    z: jax.Array | None,
    params: MRLAParams,
    phi: Callable = elu_feature_map,
    eps: float = 1e-6,
):
    """Channel-wise linear layer attention (one head per channel).

    State: s [B, C, H*W], z [B, C].  Reference linear_cla.
    """
    b, h, w, c = x.shape
    q, k, v = _qkv(x, params, phi)
    vf = v.astype(jnp.float32).reshape(b, h * w, c)
    kv = k[:, :, None] * jnp.moveaxis(vf, 1, 2)  # [B, C, HW]
    s = kv if s is None else s + kv
    z = k if z is None else z + k
    qz = 1.0 / (q * (z + eps))  # [B, C]
    out = q[:, :, None] * s * qz[:, :, None]  # [B, C, HW]
    out = jnp.moveaxis(out, 1, 2).reshape(b, h, w, c)
    return out.astype(x.dtype), s, z


def linear_gla_step(
    x: jax.Array,
    s: jax.Array | None,
    z: jax.Array | None,
    params: MRLAParams,
    groups: int,
    phi: Callable = elu_feature_map,
    eps: float = 1e-6,
):
    """Group-wise linear layer attention (reference linear_gla).

    State: s [B, g, d, d, H*W] with d = C/g, z [B, C].
    """
    b, h, w, c = x.shape
    d = c // groups
    q, k, v = _qkv(x, params, phi)
    qg = q.reshape(b, groups, d)
    kg = k.reshape(b, groups, d)
    vf = v.astype(jnp.float32).reshape(b, h * w, groups, d)
    kv = jnp.einsum("bgc,bpgs->bgcsp", kg, vf)  # [B, g, d, d, HW]
    s = kv if s is None else s + kv
    zg = kg if z is None else z + kg
    qz = 1.0 / jnp.einsum("bgc,bgc->bg", qg, zg + eps)  # [B, g]
    out = jnp.einsum("bgc,bgcsp,bg->bpgs", qg, s, qz)  # [B, HW, g, d]
    return out.reshape(b, h, w, c).astype(x.dtype), s, zg
