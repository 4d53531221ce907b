"""DeiT / ViT baselines (Flax, token-major [B, N, C]).

Capability parity with /root/reference/deit/deit.py and models.py: plain and
distilled DeiT tiny/small/base @ patch16-224 (plus the tiny-patch8 variant).
TPU-first: bf16 compute, fp32 LayerNorm/softmax, static token count.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu.models.registry import register_model

TRUNC02 = nn.initializers.truncated_normal(stddev=0.02, lower=-2.0, upper=2.0)


def layer_norm(dtype, name):
    # torch LayerNorm(eps=1e-6) per the reference partial
    return nn.LayerNorm(epsilon=1e-6, dtype=dtype, name=name)


class PatchEmbed(nn.Module):
    """Conv patchifier: [B, H, W, 3] -> [B, N, C]."""

    patch_size: int = 16
    embed_dim: int = 768
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        p = self.patch_size
        x = nn.Conv(
            self.embed_dim,
            kernel_size=(p, p),
            strides=(p, p),
            padding="VALID",
            kernel_init=TRUNC02,
            dtype=self.dtype,
            name="proj",
        )(x)
        b, gh, gw, c = x.shape
        return x.reshape(b, gh * gw, c)


class Attention(nn.Module):
    """Standard multi-head self-attention (fused qkv projection)."""

    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        b, n, c = x.shape
        h = self.num_heads
        d = c // h
        qkv = nn.Dense(
            3 * c, use_bias=self.qkv_bias, kernel_init=TRUNC02, dtype=self.dtype,
            name="qkv",
        )(x)
        qkv = qkv.reshape(b, n, 3, h, d)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, h, d]
        logits = jnp.einsum("bnhd,bmhd->bhnm", q, k).astype(jnp.float32) / jnp.sqrt(
            jnp.float32(d)
        )
        attn = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        if self.attn_drop > 0:
            attn = nn.Dropout(self.attn_drop, deterministic=deterministic)(attn)
        out = jnp.einsum("bhnm,bmhd->bnhd", attn, v).reshape(b, n, c)
        out = nn.Dense(c, kernel_init=TRUNC02, dtype=self.dtype, name="proj")(out)
        if self.proj_drop > 0:
            out = nn.Dropout(self.proj_drop, deterministic=deterministic)(out)
        return out


class Mlp(nn.Module):
    hidden: int
    drop: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        c = x.shape[-1]
        x = nn.Dense(self.hidden, kernel_init=TRUNC02, dtype=self.dtype, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=False)  # torch nn.GELU default = exact erf
        if self.drop > 0:
            x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        x = nn.Dense(c, kernel_init=TRUNC02, dtype=self.dtype, name="fc2")(x)
        if self.drop > 0:
            x = nn.Dropout(self.drop, deterministic=deterministic)(x)
        return x


class ViTBlock(nn.Module):
    """Pre-norm transformer block; hook for an MRLA epilogue module."""

    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        from mrla_tpu.nn import DropPath

        det = not train
        c = x.shape[-1]
        y = Attention(
            self.num_heads, self.qkv_bias, self.attn_drop, self.drop, self.dtype,
            name="attn",
        )(layer_norm(self.dtype, "norm1")(x), det)
        x = x + DropPath(self.drop_path, name="drop_path1")(y, det)
        y = Mlp(int(c * self.mlp_ratio), self.drop, self.dtype, name="mlp")(
            layer_norm(self.dtype, "norm2")(x), det
        )
        x = x + DropPath(self.drop_path, name="drop_path2")(y, det)
        return x


class VisionTransformer(nn.Module):
    """DeiT-style ViT, optionally distilled (dist token + second head)."""

    img_size: int = 224
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    distilled: bool = False
    drop_rate: float = 0.0
    attn_drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        b = x.shape[0]
        c = self.embed_dim
        num_tokens = 2 if self.distilled else 1
        x = x.astype(self.dtype)
        tokens = PatchEmbed(self.patch_size, c, self.dtype, name="patch_embed")(x)
        n_patches = tokens.shape[1]

        cls = self.param("cls_token", TRUNC02, (1, 1, c))
        parts = [jnp.broadcast_to(cls.astype(tokens.dtype), (b, 1, c))]
        if self.distilled:
            dist = self.param("dist_token", TRUNC02, (1, 1, c))
            parts.append(jnp.broadcast_to(dist.astype(tokens.dtype), (b, 1, c)))
        parts.append(tokens)
        x = jnp.concatenate(parts, axis=1)

        pos = self.param(
            "pos_embed", TRUNC02, (1, n_patches + num_tokens, c)
        )
        x = x + pos.astype(x.dtype)
        if self.drop_rate > 0:
            x = nn.Dropout(self.drop_rate, deterministic=not train)(x)

        dpr = [self.drop_path_rate * i / max(1, self.depth - 1) for i in range(self.depth)]
        for i in range(self.depth):
            x = ViTBlock(
                self.num_heads,
                self.mlp_ratio,
                self.qkv_bias,
                self.drop_rate,
                self.attn_drop_rate,
                dpr[i],
                self.dtype,
                name=f"block{i}",
            )(x, train)

        x = layer_norm(self.dtype, "norm")(x)
        head = nn.Dense(
            self.num_classes,
            kernel_init=TRUNC02,
            dtype=self.dtype,
            name="head",
        )
        if self.distilled:
            out = head(x[:, 0])
            out_dist = nn.Dense(
                self.num_classes,
                kernel_init=TRUNC02,
                dtype=self.dtype,
                name="head_dist",
            )(x[:, 1])
            if train:
                return out.astype(jnp.float32), out_dist.astype(jnp.float32)
            return ((out + out_dist) / 2).astype(jnp.float32)
        return head(x[:, 0]).astype(jnp.float32)


def _vit(embed_dim, depth, num_heads, patch_size=16, **kw):
    return VisionTransformer(
        patch_size=patch_size, embed_dim=embed_dim, depth=depth,
        num_heads=num_heads, **kw,
    )


@register_model
def deit_tiny_patch16_224(**kw):
    return _vit(192, 12, 3, **kw)


@register_model
def deit_small_patch16_224(**kw):
    return _vit(384, 12, 6, **kw)


@register_model
def deit_base_patch16_224(**kw):
    return _vit(768, 12, 12, **kw)


@register_model
def deit_tiny_patch8_224(**kw):
    return _vit(192, 12, 3, patch_size=8, **kw)


@register_model
def deit_tiny_distilled_patch16_224(**kw):
    return _vit(192, 12, 3, distilled=True, **kw)


@register_model
def deit_small_distilled_patch16_224(**kw):
    return _vit(384, 12, 6, distilled=True, **kw)


@register_model
def deit_base_distilled_patch16_224(**kw):
    return _vit(768, 12, 12, distilled=True, **kw)


@register_model
def deit_base_patch16_384(**kw):
    # /root/reference/deit/models.py:152-165: identical base config at
    # img_size=384 (577 pos-embed positions; our pos_embed is sized from the
    # actual input so 224-ckpt -> 384 finetune goes through
    # utils/finetune.py's bicubic interpolation).
    kw.setdefault("img_size", 384)
    return _vit(768, 12, 12, **kw)


@register_model
def deit_base_distilled_patch16_384(**kw):
    # /root/reference/deit/models.py:167-179
    kw.setdefault("img_size", 384)
    return _vit(768, 12, 12, distilled=True, **kw)
