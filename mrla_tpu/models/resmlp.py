"""ResMLP baselines (Flax).

Capability parity with /root/reference/deit/resmlp_models.py (an upstream
DeiT-repo baseline, no MRLA content): Affine pre-norms, token-mixing linear
over the patch axis, layer-scale residuals (init 1e-4/1e-5), mean-pooled
head.  Registered sizes: resmlp_12/24/36 and resmlpB_24 (patch 8).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu.models.deit import Mlp, PatchEmbed, TRUNC02
from mrla_tpu.models.registry import register_model
from mrla_tpu.nn import DropPath


class Affine(nn.Module):
    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        alpha = self.param("alpha", nn.initializers.ones, (dim,))
        beta = self.param("beta", nn.initializers.zeros, (dim,))
        return alpha.astype(x.dtype) * x + beta.astype(x.dtype)


class ResMLPBlock(nn.Module):
    num_patches: int
    init_values: float = 1e-4
    drop: float = 0.0
    drop_path: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> jax.Array:
        det = not train
        dim = x.shape[-1]
        lsinit = lambda v: (lambda key, shape, dtype=jnp.float32: jnp.full(
            shape, v, dtype))
        g1 = self.param("gamma_1", lsinit(self.init_values), (dim,))
        g2 = self.param("gamma_2", lsinit(self.init_values), (dim,))

        # token-mixing: linear across the patch axis
        y = Affine(name="norm1")(x)
        y = jnp.swapaxes(y, 1, 2)  # [B, C, N]
        y = nn.Dense(self.num_patches, kernel_init=TRUNC02, dtype=self.dtype,
                     name="attn")(y)
        y = jnp.swapaxes(y, 1, 2)
        x = x + DropPath(self.drop_path, name="dp1")(
            g1.astype(y.dtype) * y, det
        )

        y = Mlp(int(4.0 * dim), self.drop, self.dtype, name="mlp")(
            Affine(name="norm2")(x), det
        )
        x = x + DropPath(self.drop_path, name="dp2")(
            g2.astype(y.dtype) * y, det
        )
        return x


class ResMLP(nn.Module):
    patch_size: int = 16
    num_classes: int = 1000
    embed_dim: int = 384
    depth: int = 12
    init_scale: float = 1e-4
    drop_rate: float = 0.0
    drop_path_rate: float = 0.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        x = x.astype(self.dtype)
        tokens = PatchEmbed(self.patch_size, self.embed_dim, self.dtype,
                            name="patch_embed")(x)
        n = tokens.shape[1]
        for i in range(self.depth):
            tokens = ResMLPBlock(
                num_patches=n, init_values=self.init_scale,
                drop=self.drop_rate, drop_path=self.drop_path_rate,
                dtype=self.dtype, name=f"block{i}",
            )(tokens, train)
        tokens = Affine(name="norm")(tokens)
        pooled = jnp.mean(tokens, axis=1)
        out = nn.Dense(self.num_classes, kernel_init=TRUNC02, dtype=self.dtype,
                       name="head")(pooled)
        return out.astype(jnp.float32)


@register_model
def resmlp_12(**kw):
    return ResMLP(embed_dim=384, depth=12, init_scale=0.1, **kw)


@register_model
def resmlp_24(**kw):
    return ResMLP(embed_dim=384, depth=24, init_scale=1e-5, **kw)


@register_model
def resmlp_36(**kw):
    return ResMLP(embed_dim=384, depth=36, init_scale=1e-6, **kw)


@register_model
def resmlpB_24(**kw):
    return ResMLP(patch_size=8, embed_dim=768, depth=24, init_scale=1e-6, **kw)
