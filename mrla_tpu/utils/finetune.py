"""Fine-tuning surgery (reference deit/main.py:259-293):

  * position-embedding bicubic interpolation when the token grid changes;
  * classifier head re-initialization for a new class count.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def _torch_bicubic_weights(n_in: int, n_out: int) -> np.ndarray:
    """[n_out, n_in] interpolation matrix matching torch F.interpolate
    (mode='bicubic', align_corners=False): cubic convolution with A=-0.75
    and clamped edge taps.  NOTE jax.image.resize's bicubic is the Keys
    kernel (A=-0.5) — numerically different from the reference."""
    A = -0.75

    def kern(x: float) -> float:
        ax = abs(x)
        if ax <= 1.0:
            return ((A + 2.0) * ax - (A + 3.0)) * ax * ax + 1.0
        if ax < 2.0:
            return A * (((ax - 5.0) * ax + 8.0) * ax - 4.0)
        return 0.0

    w = np.zeros((n_out, n_in))
    scale = n_in / n_out
    for i in range(n_out):
        x = (i + 0.5) * scale - 0.5
        x0 = int(np.floor(x))
        for k in range(-1, 3):
            idx = min(max(x0 + k, 0), n_in - 1)
            w[i, idx] += kern(x - (x0 + k))
    return w


def interpolate_pos_embed(
    pos_embed: jax.Array, new_num_patches: int, num_extra_tokens: int = 1
) -> jax.Array:
    """[1, old_n + extra, C] -> [1, new_num_patches + extra, C], bicubic on
    the square patch grid with torch-exact coefficients
    (deit/main.py:273-287: F.interpolate mode='bicubic')."""
    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:]
    old_n = grid.shape[1]
    c = grid.shape[2]
    old_s = int(math.isqrt(old_n))
    new_s = int(math.isqrt(new_num_patches))
    assert old_s * old_s == old_n and new_s * new_s == new_num_patches
    if new_s == old_s:
        return pos_embed
    g = grid.reshape(old_s, old_s, c).astype(jnp.float32)
    w = jnp.asarray(_torch_bicubic_weights(old_s, new_s), jnp.float32)
    g = jnp.einsum("oi,ijc->ojc", w, g)  # rows
    g = jnp.einsum("oj,ijc->ioc", w, g)  # cols
    g = g.reshape(1, new_s * new_s, c).astype(pos_embed.dtype)
    return jnp.concatenate([extra, g], axis=1)


def reset_classifier(params: Dict, num_classes: int, rng: jax.Array,
                     head_names=("head", "head_dist")) -> Dict:
    """Fresh classification head(s) for a new class count.  The reference
    fine-tune deletes mismatched head keys and keeps the model's fresh
    init (deit/main.py:268-272 + load_state_dict(strict=False)), which is
    trunc-normal(0.02) weight / zero bias — match that, not zeros.

    Init-statistics note (same TRUNC02 convention as the rest of the repo):
    jax.random.truncated_normal(-2, 2) * 0.02 truncates at ±2σ in UNIT space
    (effective std ≈ 0.0176) while timm's trunc_normal_(std=.02, a=-2, b=2)
    cuts at ±2 in VALUE space (±100σ — effectively untruncated, std 0.02).
    A ~12% std difference on a freshly trained head; accepted deviation."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for key, v in flat.items():
        if key[0] in head_names:
            if key[-1] == "kernel":
                rng, sub = jax.random.split(rng)
                out[key] = jax.random.truncated_normal(
                    sub, -2.0, 2.0, (v.shape[0], num_classes), jnp.float32
                ).astype(v.dtype) * 0.02
            else:
                out[key] = jnp.zeros((num_classes,), v.dtype)
        else:
            out[key] = v
    return flax.traverse_util.unflatten_dict(out)
