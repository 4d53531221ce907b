"""Fine-tuning surgery (reference deit/main.py:259-293):

  * position-embedding bicubic interpolation when the token grid changes;
  * classifier head re-initialization for a new class count.
"""

from __future__ import annotations

import math
from typing import Dict

import jax
import jax.numpy as jnp


def interpolate_pos_embed(
    pos_embed: jax.Array, new_num_patches: int, num_extra_tokens: int = 1
) -> jax.Array:
    """[1, old_n + extra, C] -> [1, new_num_patches + extra, C], bicubic on
    the square patch grid (deit/main.py:273-287 semantics)."""
    extra = pos_embed[:, :num_extra_tokens]
    grid = pos_embed[:, num_extra_tokens:]
    old_n = grid.shape[1]
    c = grid.shape[2]
    old_s = int(math.isqrt(old_n))
    new_s = int(math.isqrt(new_num_patches))
    assert old_s * old_s == old_n and new_s * new_s == new_num_patches
    grid = grid.reshape(1, old_s, old_s, c)
    grid = jax.image.resize(grid, (1, new_s, new_s, c), method="bicubic")
    grid = grid.reshape(1, new_s * new_s, c)
    return jnp.concatenate([extra, grid], axis=1)


def reset_classifier(params: Dict, num_classes: int, rng: jax.Array,
                     head_names=("head", "head_dist")) -> Dict:
    """Zero-init new classification head(s) of a converted checkpoint
    (deit fine-tune re-keys the head; DeiT head init is zeros)."""
    import flax

    flat = flax.traverse_util.flatten_dict(params)
    out = {}
    for key, v in flat.items():
        if key[0] in head_names:
            if key[-1] == "kernel":
                out[key] = jnp.zeros((v.shape[0], num_classes), v.dtype)
            else:
                out[key] = jnp.zeros((num_classes,), v.dtype)
        else:
            out[key] = v
    return flax.traverse_util.unflatten_dict(out)
