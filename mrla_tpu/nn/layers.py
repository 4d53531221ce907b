"""Parameterized MRLA / channel-attention layers (Flax linen, NHWC).

Parity notes (vs /root/reference, see SURVEY.md §2.1/§2.7):
  * MRLA-light gate is SIGMOID (mrla_light_module.py:70); MRLA-base is
    SOFTMAX over the layer axis t (mrla_base_module.py:82).
  * λ is initialized from a standard normal (resnet_mrla_light.py:38) —
    an intentional reference quirk we preserve.
  * Q/K are bias-free k-tap convs over the channel axis with the ECA
    kernel-size heuristic; V is a bias-free depthwise 3x3.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu import ops
from mrla_tpu.ops.mrla import MRLACache, MRLAParams


def _resolve_heads(channels: int, heads: Optional[int], dim_perhead: Optional[int]) -> int:
    if heads is None and dim_perhead is None:
        raise ValueError("one of heads / dim_perhead must be given")
    if dim_perhead is not None:
        heads = channels // dim_perhead
    if channels % heads != 0:
        raise ValueError(f"channels ({channels}) must be divisible by heads ({heads})")
    return heads


class _MRLAProjections(nn.Module):
    """Shared Q/K/V parameter block of every MRLA variant."""

    k_size: Optional[int] = None

    @nn.compact
    def __call__(self, channels: int) -> MRLAParams:
        k = self.k_size or ops.eca_kernel_size(channels)
        # torch Conv1d default init: uniform(-1/sqrt(fan_in), +) with fan_in=k.
        lim = 1.0 / (k ** 0.5)
        init1d = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
            key, shape, dtype, -lim, lim
        )
        wq = self.param("wq", init1d, (k,))
        wk = self.param("wk", init1d, (k,))
        # depthwise 3x3 HWIO [3,3,1,C]; kaiming-normal fan_out (model-level
        # conv init of the reference, resnet_mrla_light.py:176-178).
        wv = self.param(
            "wv",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (3, 3, 1, channels),
        )
        return MRLAParams(wq=wq, wk=wk, wv=wv)


class MRLALightLayer(nn.Module):
    """mrla_light_layer: sigmoid-gated single-position layer attention."""

    heads: Optional[int] = None
    dim_perhead: Optional[int] = None
    k_size: Optional[int] = None
    act_v: Optional[Callable] = None  # DeiT variant applies exact GELU to V

    @nn.compact
    def __call__(self, x: jax.Array, params_only: bool = False):
        c = x.shape[-1]
        g = _resolve_heads(c, self.heads, self.dim_perhead)
        params = _MRLAProjections(self.k_size, name="proj")(c)
        if params_only:
            # fused-epilogue path (ops/fused_train.py): expose the weights
            # without computing — param tree stays identical either way
            return params, g
        return ops.mrla_light_attention(x, params, g, act_v=self.act_v)


class MRLALightModule(nn.Module):
    """mrla_module (light): o_t = attn(x_t) + λ ⊙ o_{t-1}, λ ~ N(0,1) per channel."""

    dim_perhead: int = 32
    act_v: Optional[Callable] = None

    @nn.compact
    def __call__(self, xt: jax.Array, ot_1: jax.Array,
                 params_only: bool = False):
        c = xt.shape[-1]
        layer = MRLALightLayer(
            dim_perhead=self.dim_perhead, act_v=self.act_v, name="mrla"
        )
        if params_only:
            proj, g = layer(xt, params_only=True)
            lam = self.param("lambda_t", nn.initializers.normal(1.0), (c,))
            return proj, lam, g
        attn_t = layer(xt)
        lam = self.param("lambda_t", nn.initializers.normal(1.0), (c,))
        return attn_t + lam.astype(ot_1.dtype) * ot_1


class MRLABaseLayer(nn.Module):
    """mrla_base_layer: K/V-cached attention with softmax over the layer axis."""

    heads: Optional[int] = None
    dim_perhead: Optional[int] = None
    k_size: Optional[int] = None

    @nn.compact
    def __call__(
        self, x: jax.Array, cache: Optional[MRLACache]
    ) -> tuple[jax.Array, MRLACache]:
        c = x.shape[-1]
        g = _resolve_heads(c, self.heads, self.dim_perhead)
        params = _MRLAProjections(self.k_size, name="proj")(c)
        return ops.mrla_base_attention(x, params, g, cache)


class MRLABaseModule(nn.Module):
    """mrla_module (base): growing K/V cache, softmax over the layer axis.

    ``cache=None`` resets the recurrence (init_cell at each stage head,
    reference resnet_mrla_base.py:44-51,192-195).
    """

    dim_perhead: int = 16
    channel_wise: bool = False

    @nn.compact
    def __call__(
        self, xt: jax.Array, cache: Optional[MRLACache]
    ) -> tuple[jax.Array, MRLACache]:
        dph = 1 if self.channel_wise else self.dim_perhead
        return MRLABaseLayer(dim_perhead=dph, name="mrla")(xt, cache)


class SELayer(nn.Module):
    """Squeeze-and-excitation channel gate (reduction 16 by default)."""

    reduction: int = 16

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        # torch Linear default init: uniform(-1/sqrt(fan_in), +).
        def lin_init(fan_in):
            lim = 1.0 / (fan_in ** 0.5)
            return lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -lim, lim
            )

        w1 = self.param("w1", lin_init(c), (c, c // self.reduction))
        w2 = self.param("w2", lin_init(c // self.reduction), (c // self.reduction, c))
        return ops.se_gate(x, w1, w2)


class ECALayer(nn.Module):
    """Efficient channel attention gate with adaptive kernel size."""

    k_size: Optional[int] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        c = x.shape[-1]
        k = self.k_size or ops.eca_kernel_size(c)
        lim = 1.0 / (k ** 0.5)
        w = self.param(
            "w",
            lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -lim, lim
            ),
            (k,),
        )
        return ops.eca_gate(x, w)


class DropPath(nn.Module):
    """Per-sample stochastic depth; identity when deterministic or rate=0."""

    rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, deterministic: bool) -> jax.Array:
        if self.rate == 0.0 or deterministic:
            return x
        key = self.make_rng("droppath")
        return ops.drop_path(x, self.rate, key, deterministic=False)
