"""DeiT-family inference engine (bf16, pre-cast params).

Unlike the ResNet engines there is no BN to fold — DeiT normalization is
LayerNorm, which is data-dependent — so the serving win here is:

  * params are cast to bf16 ONCE at load (prepare_deit_inference_params)
    instead of per step inside the jitted forward (params are jit inputs,
    so flax's dtype-based cast re-runs every dispatch otherwise);
  * LayerNorm scales/biases stay fp32 (normalization statistics are
    computed in fp32; keeping the affine in fp32 costs nothing — the
    tensors are [C]-sized — and preserves eval parity);
  * dropout/drop-path branches are statically absent (train=False models).

Works for EVERY registered arch whose forward is
`model.apply(vars, x, train=False)` — deit/deit_mrla*/resmlp/patchconvnet
AND the BN families (efficientnet_mrlal_b0, resnets): the engine rebuilds
the architecture with dtype=bfloat16 (so flax norm layers compute in fp32
and cast back to bf16) and applies the cast tree; eval-mode BN reads the
fp32 running stats.  Generic aliases: prepare_precast_inference_params /
precast_forward.  The ResNet families have dedicated BN-FOLDING engines
(resnet_mrlal/resnet_mrlab) that are faster; this one is the catch-all.

Reference behavior: /root/reference/deit/deit.py, deit_mrla_light.py,
deit_mrla_base.py (eval path; distilled eval = (cls + dist) / 2 is inside
the model per deit.py:200).
"""

from __future__ import annotations

import functools
from typing import Any, Dict

import jax
import jax.numpy as jnp


_FP32_KEEP = ("norm", "bn")  # LayerNorm / (ResMLP affine) param groups


def _cast_tree(tree: Dict, dtype) -> Dict:
    """Cast params to `dtype`, keeping any '*norm*' module's leaves fp32."""

    def walk(node, keep_fp32):
        if isinstance(node, dict):
            return {
                k: walk(
                    v,
                    keep_fp32 or any(t in k.lower() for t in _FP32_KEEP),
                )
                for k, v in node.items()
            }
        if keep_fp32:
            return jnp.asarray(node, jnp.float32)
        return jnp.asarray(node, dtype)

    return walk(tree, False)


def prepare_deit_inference_params(
    arch: str, variables: Dict, dtype=jnp.bfloat16, **model_kw: Any
):
    """Returns (model, cast_variables) ready for deit_forward.

    `arch` is any registry name (deit_*, deit_mrlal_*, deit_mrlab_*,
    resmlp_*, patchconvnet s60/...); `variables` its trained/converted
    variable tree.
    """
    from mrla_tpu.models import create_model

    model = create_model(arch, dtype=dtype, **model_kw)
    cast = dict(variables)
    cast["params"] = _cast_tree(variables["params"], dtype)
    return model, cast


@functools.partial(jax.jit, static_argnames=("model", "microbatch"))
def deit_forward(
    model, variables: Dict, x: jax.Array, microbatch: int = 16
) -> jax.Array:
    """[B, H, W, 3] -> logits fp32 (eval semantics, train=False).

    microbatch: trace the batch as independent `microbatch`-image chains
    in one program (see resnet_mrlal_forward — same mechanism, same
    bitwise-parity guarantee: LayerNorm/attention are per-sample math).
    Measured v5e bs128 bf16 224px deit_mrlal_small (honest input-perturbed
    harness, scripts/bench_misc.py): mb0 4189 / mb16 5780 (+38%) / mb32
    4980 img/s — the smaller per-chain activations pipeline through VMEM
    between the per-block matmul groups.  0 disables."""
    if microbatch and x.shape[0] > microbatch and x.shape[0] % microbatch == 0:
        return jnp.concatenate(
            [
                model.apply(
                    variables, x[i * microbatch : (i + 1) * microbatch],
                    train=False,
                ).astype(jnp.float32)
                for i in range(x.shape[0] // microbatch)
            ],
            axis=0,
        )
    return model.apply(variables, x, train=False).astype(jnp.float32)


# Generic names: the engine is arch-agnostic (see module docstring).
prepare_precast_inference_params = prepare_deit_inference_params
precast_forward = deit_forward
