"""PatchConvNet baselines (Flax).

Capability parity with /root/reference/deit/patchconvnet_models.py (upstream
DeiT-repo baseline, no MRLA content): 4x conv3x3/2 ConvStem, depth x
layer-scaled SE-conv blocks on the token grid, one learned-aggregation
class-attention block, linear head.  Registered sizes: S60/S120/B60/B120/
L60/L120 plus the multiclass-token S60_multi (patchconvnet_models.py:309-420
— multi uses one cls token PER class, class attention with q over the cls
tokens and k/v over the patch tokens only, and a per-class 1-logit head).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu.models.deit import Mlp, TRUNC02, layer_norm
from mrla_tpu.models.registry import register_model
from mrla_tpu.nn import DropPath

_GELU = lambda v: jax.nn.gelu(v, approximate=False)


class ConvStem(nn.Module):
    """4x (conv3x3 stride 2 + GELU except last): [B,H,W,3] -> [B,N,C]."""

    embed_dim: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dims = [self.embed_dim // 8, self.embed_dim // 4, self.embed_dim // 2,
                self.embed_dim]
        for i, d in enumerate(dims):
            x = nn.Conv(d, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)),
                        use_bias=False, kernel_init=TRUNC02, dtype=self.dtype,
                        name=f"conv{i}")(x)
            if i < 3:
                x = _GELU(x)
        b, h, w, c = x.shape
        return x.reshape(b, h * w, c)


class ConvBlockSE(nn.Module):
    """1x1 -> GELU -> dw3x3(bias) -> GELU -> SE(0.25) -> 1x1 on the token grid."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        b, n, c = x.shape
        s = int(n ** 0.5)
        g = x.reshape(b, s, s, c)
        g = nn.Conv(c, (1, 1), kernel_init=TRUNC02, dtype=self.dtype,
                    name="pw1")(g)
        g = _GELU(g)
        g = nn.Conv(c, (3, 3), padding=((1, 1), (1, 1)), feature_group_count=c,
                    kernel_init=TRUNC02, dtype=self.dtype, name="dw")(g)
        g = _GELU(g)
        # SE with rd_ratio 0.25
        y = jnp.mean(g.astype(jnp.float32), axis=(1, 2))
        y = nn.Dense(c // 4, dtype=jnp.float32, name="se_fc1")(y)
        y = nn.relu(y)
        y = nn.Dense(c, dtype=jnp.float32, name="se_fc2")(y)
        g = g * jax.nn.sigmoid(y)[:, None, None, :].astype(g.dtype)
        g = nn.Conv(c, (1, 1), kernel_init=TRUNC02, dtype=self.dtype,
                    name="pw2")(g)
        return g.reshape(b, n, c)


class LearnedAggregation(nn.Module):
    """Single-query class attention: cls attends over [cls; tokens]."""

    num_heads: int = 1
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, u: jax.Array) -> jax.Array:
        b, n, c = u.shape
        h = self.num_heads
        d = c // h
        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=TRUNC02,
                     dtype=self.dtype, name="q")(u[:, 0])
        k = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=TRUNC02,
                     dtype=self.dtype, name="k")(u)
        v = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=TRUNC02,
                     dtype=self.dtype, name="v")(u)
        q = q.reshape(b, 1, h, d)
        k = k.reshape(b, n, h, d)
        v = v.reshape(b, n, h, d)
        logits = jnp.einsum("bihd,bnhd->bhin", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(d)), axis=-1)
        out = jnp.einsum("bhin,bnhd->bihd", attn.astype(v.dtype), v)
        out = out.reshape(b, 1, c)
        return nn.Dense(c, kernel_init=TRUNC02, dtype=self.dtype, name="proj")(out)


class LearnedAggregationMulti(nn.Module):
    """Multiclass class attention (patchconvnet_models.py:77-112): q from the
    first num_cls (class) tokens, k/v from the PATCH tokens only — unlike the
    single-token variant, the class tokens are excluded from keys/values."""

    num_cls: int
    num_heads: int = 1
    qkv_bias: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, u: jax.Array) -> jax.Array:
        b, n, c = u.shape
        h = self.num_heads
        d = c // h
        m = self.num_cls
        q = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=TRUNC02,
                     dtype=self.dtype, name="q")(u[:, :m])
        k = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=TRUNC02,
                     dtype=self.dtype, name="k")(u[:, m:])
        v = nn.Dense(c, use_bias=self.qkv_bias, kernel_init=TRUNC02,
                     dtype=self.dtype, name="v")(u[:, m:])
        q = q.reshape(b, m, h, d)
        k = k.reshape(b, n - m, h, d)
        v = v.reshape(b, n - m, h, d)
        logits = jnp.einsum("bihd,bnhd->bhin", q, k).astype(jnp.float32)
        attn = jax.nn.softmax(logits / jnp.sqrt(jnp.float32(d)), axis=-1)
        out = jnp.einsum("bhin,bnhd->bihd", attn.astype(v.dtype), v)
        out = out.reshape(b, m, c)
        return nn.Dense(c, kernel_init=TRUNC02, dtype=self.dtype, name="proj")(out)


class PatchConvNet(nn.Module):
    num_classes: int = 1000
    embed_dim: int = 384
    depth: int = 60
    init_scale: float = 1e-6
    mlp_ratio_clstk: float = 3.0
    drop_path_rate: float = 0.0
    multiclass: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        det = not train
        c = self.embed_dim
        x = x.astype(self.dtype)
        tokens = ConvStem(c, self.dtype, name="patch_embed")(x)
        b = tokens.shape[0]

        lsinit = lambda v: (lambda key, shape, dtype=jnp.float32: jnp.full(
            shape, v, dtype))
        for i in range(self.depth):
            g = self.param(f"gamma_{i}", lsinit(self.init_scale), (c,))
            y = ConvBlockSE(self.dtype, name=f"block{i}")(
                layer_norm(self.dtype, f"norm{i}")(tokens)
            )
            tokens = tokens + DropPath(self.drop_path_rate, name=f"dp{i}")(
                g.astype(y.dtype) * y, det
            )

        n_cls = self.num_classes if self.multiclass else 1
        cls = self.param("cls_token", TRUNC02, (1, n_cls, c))
        cls = jnp.broadcast_to(cls.astype(tokens.dtype), (b, n_cls, c))
        # one class-attention block (depth_token_only=1 for all sizes)
        g1 = self.param("cls_gamma_1", lsinit(self.init_scale), (c,))
        g2 = self.param("cls_gamma_2", lsinit(self.init_scale), (c,))
        u = jnp.concatenate([cls, tokens], axis=1)
        if self.multiclass:
            y = LearnedAggregationMulti(n_cls, dtype=self.dtype,
                                        name="cls_attn")(
                layer_norm(self.dtype, "cls_norm1")(u)
            )
        else:
            y = LearnedAggregation(dtype=self.dtype, name="cls_attn")(
                layer_norm(self.dtype, "cls_norm1")(u)
            )
        cls = cls + g1.astype(y.dtype) * y
        y = Mlp(int(c * self.mlp_ratio_clstk), 0.0, self.dtype, name="cls_mlp")(
            layer_norm(self.dtype, "cls_norm2")(cls), det
        )
        cls = cls + g2.astype(y.dtype) * y

        cls = layer_norm(self.dtype, "norm")(cls)
        if self.multiclass:
            # reference: one Linear(C, 1) PER class applied to its own token
            # (patchconvnet_models.py:271-272,324-330) — stacked here as a
            # single [num_classes, C] kernel + [num_classes] bias einsum.
            wk = self.param("head_multi_kernel", TRUNC02, (n_cls, c))
            wb = self.param(
                "head_multi_bias",
                lambda key, shape, dtype=jnp.float32: jnp.zeros(shape, dtype),
                (n_cls,),
            )
            out = jnp.einsum("bic,ic->bi", cls.astype(jnp.float32),
                             wk.astype(jnp.float32)) + wb
            return out.astype(jnp.float32)
        out = nn.Dense(self.num_classes, kernel_init=TRUNC02, dtype=self.dtype,
                       name="head")(cls[:, 0])
        return out.astype(jnp.float32)


@register_model
def patchconvnet_s60(**kw):
    return PatchConvNet(embed_dim=384, depth=60, init_scale=1e-6, **kw)


@register_model
def patchconvnet_s120(**kw):
    return PatchConvNet(embed_dim=384, depth=120, init_scale=1e-6, **kw)


@register_model
def patchconvnet_b60(**kw):
    return PatchConvNet(embed_dim=768, depth=60, init_scale=1e-6, **kw)


@register_model
def patchconvnet_b120(**kw):
    return PatchConvNet(embed_dim=768, depth=120, init_scale=1e-6, **kw)


@register_model
def patchconvnet_l60(**kw):
    # L60 (patchconvnet_models.py:381-393): embed 1024, init_scale 1e-6
    return PatchConvNet(embed_dim=1024, depth=60, init_scale=1e-6, **kw)


@register_model
def patchconvnet_l120(**kw):
    # L120 (patchconvnet_models.py:395-406)
    return PatchConvNet(embed_dim=1024, depth=120, init_scale=1e-6, **kw)


@register_model
def patchconvnet_s60_multi(**kw):
    # S60_multi (patchconvnet_models.py:407-420): one cls token per class,
    # multi-query class attention, per-class 1-logit heads.  NOTE the
    # reference factory does NOT pass init_scale, so the PatchConvnet
    # default 1e-4 applies (patchconvnet_models.py:221).
    return PatchConvNet(embed_dim=384, depth=60, init_scale=1e-4,
                        multiclass=True, **kw)
