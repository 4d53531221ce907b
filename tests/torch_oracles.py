"""Independent PyTorch oracles for golden-value testing.

These re-state the MRLA math from the paper (arXiv:2302.03985 eqs. 4, 6, 8)
in minimal torch so the JAX implementations can be validated numerically.
They are test-only code, written from the equations — NOT imports of, or
copies from, the reference repo.  NCHW here (torch-native); the tests
transpose at the boundary.
"""

from __future__ import annotations

import math

import torch
import torch.nn.functional as F


def channel_conv1d_torch(y: torch.Tensor, w: torch.Tensor) -> torch.Tensor:
    """[B, C] descriptor cross-correlated with k taps along C, SAME padded."""
    k = w.numel()
    return F.conv1d(y[:, None, :], w.view(1, 1, k), padding=(k - 1) // 2)[:, 0]


def gap_nchw(x: torch.Tensor) -> torch.Tensor:
    return x.mean(dim=(2, 3))  # [B, C]


def mrla_light_oracle(
    x: torch.Tensor,  # [B, C, H, W]
    wq: torch.Tensor,  # [k]
    wk: torch.Tensor,  # [k]
    wv: torch.Tensor,  # [C, 1, 3, 3] depthwise OIHW
    heads: int,
    gelu_v: bool = False,
) -> torch.Tensor:
    b, c, h, w = x.shape
    d = c // heads
    y = gap_nchw(x)
    q = channel_conv1d_torch(y, wq).view(b, heads, d)
    kk = channel_conv1d_torch(y, wk).view(b, heads, d)
    v = F.conv2d(x, wv, padding=1, groups=c)
    if gelu_v:
        v = F.gelu(v)
    attn = torch.sigmoid((q * kk).sum(-1) / math.sqrt(d))  # [B, g]
    gate = attn.repeat_interleave(d, dim=1)  # [B, C]
    return v * gate[:, :, None, None]


def mrla_base_oracle(
    xs: list[torch.Tensor],  # list of [B, C, H, W], one per layer (same shape)
    wq: list[torch.Tensor],
    wk: list[torch.Tensor],
    wv: list[torch.Tensor],
    heads: int,
) -> list[torch.Tensor]:
    """Run the eq.-6 recurrence over a stage; returns per-layer outputs."""
    outs = []
    k_cache, v_cache = None, None
    for t, x in enumerate(xs):
        b, c, h, w = x.shape
        d = c // heads
        y = gap_nchw(x)
        q = channel_conv1d_torch(y, wq[t]).view(b, heads, 1, d)
        k_t = channel_conv1d_torch(y, wk[t])[:, None, :]  # [B,1,C]
        v_t = F.conv2d(x, wv[t], padding=1, groups=c)[:, None]  # [B,1,C,H,W]
        k_cache = k_t if k_cache is None else torch.cat([k_cache, k_t], dim=1)
        v_cache = v_t if v_cache is None else torch.cat([v_cache, v_t], dim=1)
        tt = k_cache.shape[1]
        kh = k_cache.view(b, tt, heads, d).permute(0, 2, 1, 3)  # [B,g,t,d]
        logits = torch.einsum("bgid,bgtd->bgit", q, kh) / math.sqrt(d)  # [B,g,1,t]
        attn = logits.softmax(dim=-1)
        vh = v_cache.view(b, tt, heads, d, h, w)
        out = torch.einsum("bgit,btgdhw->bgidhw", attn, vh).reshape(b, c, h, w)
        outs.append(out)
    return outs


def la_eq4_oracle(
    x: torch.Tensor,  # [B, C, H, W]
    ctx: torch.Tensor,  # [B, t, C, H, W]
    wq: torch.Tensor,
    wk: torch.Tensor,
    wv: torch.Tensor,
    heads: int,
) -> torch.Tensor:
    b, t, c, h, w = ctx.shape
    d = c // heads
    q = channel_conv1d_torch(gap_nchw(x), wq).view(b, heads, d)
    ctx_f = ctx.reshape(b * t, c, h, w)
    k = channel_conv1d_torch(gap_nchw(ctx_f), wk).view(b, t, heads, d)
    v = F.conv2d(ctx_f, wv, padding=1, groups=c).view(b, t, heads, d, h, w)
    logits = torch.einsum("bgd,btgd->bgt", q, k) / math.sqrt(d)
    attn = logits.softmax(dim=-1)
    return torch.einsum("bgt,btgdhw->bgdhw", attn, v).reshape(b, c, h, w)


def linear_la_oracle(xs, wq, wk, wv, eps=1e-6):
    """Full-rank linear-LA recurrence with φ = elu + 1."""
    phi = lambda v: F.elu(v) + 1.0
    outs, s, z = [], None, None
    for t, x in enumerate(xs):
        b, c, h, w = x.shape
        y = gap_nchw(x)
        q = phi(channel_conv1d_torch(y, wq[t]))  # [B, C]
        k = phi(channel_conv1d_torch(y, wk[t]))
        v = F.conv2d(x, wv[t], padding=1, groups=c).reshape(b, c * h * w)
        kv = torch.einsum("bc,bd->bcd", k, v)
        s = kv if s is None else s + kv
        z = k if z is None else z + k
        qz = 1.0 / torch.einsum("bc,bc->b", q, z + eps)
        out = torch.einsum("bc,bcd,b->bd", q, s, qz).reshape(b, c, h, w)
        outs.append(out)
    return outs


def linear_la_svd_oracle(xs, wq, wk, wv, eps=1e-6, rank=None):
    """linear_la_oracle with the state carried FACTORIZED between steps,
    restating the reference's svd=True branch (linear_la.py:86-105):
    reconstruct u·diag(σ)·vᵀ on entry, reduced SVD on exit — batched here
    (the reference's torch.mm form is single-image), with optional rank-k
    truncation."""
    phi = lambda v: F.elu(v) + 1.0
    outs, fac, z = [], None, None
    for t, x in enumerate(xs):
        b, c, h, w = x.shape
        y = gap_nchw(x)
        q = phi(channel_conv1d_torch(y, wq[t]))  # [B, C]
        k = phi(channel_conv1d_torch(y, wk[t]))
        v = F.conv2d(x, wv[t], padding=1, groups=c).reshape(b, c * h * w)
        kv = torch.einsum("bc,bd->bcd", k, v)
        if fac is None:
            s = kv
        else:
            u, sig, vv = fac
            s = torch.einsum("bck,bk,bdk->bcd", u, sig, vv) + kv
        z = k if z is None else z + k
        qz = 1.0 / torch.einsum("bc,bc->b", q, z + eps)
        out = torch.einsum("bc,bcd,b->bd", q, s, qz).reshape(b, c, h, w)
        outs.append(out)
        u, sig, vv = torch.svd(s, some=True)
        if rank is not None:
            u, sig, vv = u[..., :rank], sig[..., :rank], vv[..., :rank]
        fac = (u, sig, vv)
    return outs


def se_oracle(x: torch.Tensor, w1: torch.Tensor, w2: torch.Tensor) -> torch.Tensor:
    """SE gate; w1 [C//r, C], w2 [C, C//r] (torch Linear convention)."""
    y = gap_nchw(x)
    y = torch.sigmoid(F.linear(F.relu(F.linear(y, w1)), w2))
    return x * y[:, :, None, None]


def eca_oracle(x: torch.Tensor, w: torch.Tensor) -> torch.Tensor:
    y = torch.sigmoid(channel_conv1d_torch(gap_nchw(x), w))
    return x * y[:, :, None, None]
