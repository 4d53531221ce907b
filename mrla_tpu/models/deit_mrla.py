"""DeiT with MRLA (token-space): light (recurrent λ) and base (K/V cache).

Behavioral parity with /root/reference/deit/deit_mrla_light.py and
deit_mrla_base.py:
  * MRLA operates on the 14x14 token grid with the cls token SPLIT OUT and
    passed through untouched (light :199-207, base :234-241).  Note the
    passed-through cls is the normx-NORMALIZED cls — a reference quirk we
    preserve exactly.
  * light: GELU on V (:153,:167 — exact erf GELU), λ is a [C] vector applied
    to the norm'd previous-output tokens (:189,:206); LayerNorms normx/normo
    on both inputs (:191-196); block adds x + mrla(x, block_input) (:227-234).
  * base: init_cell every mrlab_size=4 blocks (:261-264); LayerNorm normx
    only (:216,:225); no λ recurrence — block adds attn_t directly
    (:270-277).  The reference hardcodes dpr=[0.1]*12 ignoring --drop-path
    (:340, SURVEY.md §2.7) — reproduced via drop_path_rate=0.1 uniform
    default on the mrlab factories.
  * dim_mrla (dim_perhead) = 16 for all registered sizes.

TPU-first: the token grid is NHWC natively (no NCHW permutes); token count
is static so the cache shapes are static per block.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu.models.deit import Attention, Mlp, PatchEmbed, TRUNC02, layer_norm
from mrla_tpu.models.registry import register_model
from mrla_tpu.nn import DropPath, MRLABaseModule, MRLALightLayer
from mrla_tpu.ops.mrla import MRLACache

_EXACT_GELU = lambda v: jax.nn.gelu(v, approximate=False)


def _split_cls(x: jax.Array):
    """[B, N, C] -> cls [B,1,C], grid [B,s,s,C] (N-1 must be square)."""
    b, n, c = x.shape
    s = int(math.isqrt(n - 1))
    assert s * s == n - 1, f"token count {n - 1} is not square"
    return x[:, :1], x[:, 1:].reshape(b, s, s, c)


class MRLALightTokenModule(nn.Module):
    """mrlal_module: token-space MRLA-light with λ recurrence and cls bypass."""

    dim_perhead: int = 16

    @nn.compact
    def __call__(self, xt: jax.Array, ot_1: jax.Array) -> jax.Array:
        b, n, c = xt.shape
        xt = layer_norm(xt.dtype, "normx")(xt)
        ot_1 = layer_norm(ot_1.dtype, "normo")(ot_1)

        cls, grid = _split_cls(xt)
        attn = MRLALightLayer(
            dim_perhead=self.dim_perhead, act_v=_EXACT_GELU, name="mrla"
        )(grid)
        tokens = attn.reshape(b, n - 1, c)
        lam = self.param("lambda_t", nn.initializers.normal(1.0), (c,))
        tokens = tokens + lam.astype(tokens.dtype) * ot_1[:, 1:]
        return jnp.concatenate([cls, tokens], axis=1)


class MRLABaseTokenModule(nn.Module):
    """mrlab_module: token-space MRLA-base with cls bypass; threads (K, V)."""

    dim_perhead: int = 16

    @nn.compact
    def __call__(
        self, xt: jax.Array, cache: Optional[MRLACache]
    ) -> tuple[jax.Array, MRLACache]:
        b, n, c = xt.shape
        xt = layer_norm(xt.dtype, "normx")(xt)
        cls, grid = _split_cls(xt)
        attn, new_cache = MRLABaseModule(dim_perhead=self.dim_perhead, name="mrla")(
            grid, cache
        )
        tokens = attn.reshape(b, n - 1, c)
        return jnp.concatenate([cls, tokens], axis=1), new_cache


class MRLAViTBlock(nn.Module):
    """ViT block + MRLA epilogue (light or base)."""

    num_heads: int
    dim_mrla: int = 16
    variant: str = "light"  # "light" | "base"
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, cache, train: bool):
        det = not train
        c = x.shape[-1]
        ot = x  # block input feeds the light recurrence
        y = Attention(
            self.num_heads, self.qkv_bias, self.attn_drop, self.drop, self.dtype,
            name="attn",
        )(layer_norm(self.dtype, "norm1")(x), det)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, det)
        y = Mlp(int(c * self.mlp_ratio), self.drop, self.dtype, name="mlp")(
            layer_norm(self.dtype, "norm2")(x), det
        )
        x = x + DropPath(self.drop_path, name="drop_path2")(y, det)

        if self.variant == "light":
            x = x + MRLALightTokenModule(self.dim_mrla, name="mrla")(x, ot)
            return x, None
        attn_t, new_cache = MRLABaseTokenModule(self.dim_mrla, name="mrla")(x, cache)
        return x + attn_t, new_cache


class ViTMRLA(nn.Module):
    """ViT_mrlal / ViT_mrlab container."""

    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    dim_mrla: int = 16
    variant: str = "light"
    mrlab_size: int = 4  # base: cache reset period (deit_mrla_base.py:261-264)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    drop_path_uniform: bool = False  # base: dpr=[rate]*depth (reference :340)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        b = x.shape[0]
        c = self.embed_dim
        x = x.astype(self.dtype)
        tokens = PatchEmbed(self.patch_size, c, self.dtype, name="patch_embed")(x)
        n_patches = tokens.shape[1]

        cls = self.param("cls_token", TRUNC02, (1, 1, c))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(tokens.dtype), (b, 1, c)), tokens], axis=1
        )
        pos = self.param("pos_embed", TRUNC02, (1, n_patches + 1, c))
        x = x + pos.astype(x.dtype)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        if self.drop_path_uniform:
            dpr = [self.drop_path_rate] * self.depth
        else:
            dpr = [
                self.drop_path_rate * i / max(1, self.depth - 1)
                for i in range(self.depth)
            ]
        cache = None
        for i in range(self.depth):
            if self.variant == "base" and i % self.mrlab_size == 0:
                cache = None  # init_cell
            x, cache = MRLAViTBlock(
                self.num_heads,
                self.dim_mrla,
                self.variant,
                self.mlp_ratio,
                self.qkv_bias,
                self.drop_rate,
                self.attn_drop_rate,
                dpr[i],
                self.dtype,
                name=f"block{i}",
            )(x, cache, train)

        x = layer_norm(self.dtype, "norm")(x)
        out = nn.Dense(
            self.num_classes,
            kernel_init=TRUNC02,
            dtype=self.dtype,
            name="head",
        )(x[:, 0])
        return out.astype(jnp.float32)


def _vit_mrla(embed_dim, depth, num_heads, variant, **kw):
    kw.setdefault("dim_mrla", 16)
    if variant == "base":
        # reference hardcodes dpr=[0.1]*12 (deit_mrla_base.py:340)
        kw.setdefault("drop_path_rate", 0.1)
        kw.setdefault("drop_path_uniform", True)
    return ViTMRLA(
        embed_dim=embed_dim, depth=depth, num_heads=num_heads, variant=variant, **kw
    )


@register_model
def deit_mrlal_tiny_patch16_224(**kw):
    return _vit_mrla(192, 12, 3, "light", **kw)


@register_model
def deit_mrlal_small_patch16_224(**kw):
    return _vit_mrla(384, 12, 6, "light", **kw)


@register_model
def deit_mrlal_base_patch16_224(**kw):
    return _vit_mrla(768, 12, 12, "light", **kw)


@register_model
def deit_mrlab_tiny_patch16_224(**kw):
    return _vit_mrla(192, 12, 3, "base", **kw)


@register_model
def deit_mrlab_small_patch16_224(**kw):
    return _vit_mrla(384, 12, 6, "base", **kw)


@register_model
def deit_mrlab_base_patch16_224(**kw):
    return _vit_mrla(768, 12, 12, "base", **kw)
