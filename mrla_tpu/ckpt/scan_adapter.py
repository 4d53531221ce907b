"""Adapters between unrolled and nn.scan parameter layouts.

The lax.scan MRLA-base stages (models/resnet_mrla_base.py) stack the
per-block params of blocks 1..n-1 under 'layer{S}_scan' with a leading
block axis; converted PyTorch checkpoints and the unrolled model use
per-block subtrees 'layer{S}_{i}'.  These functions translate both ways so
any checkpoint runs on either variant.
"""

from __future__ import annotations

from typing import Dict

import flax
import numpy as np


_PROJ_UNROLLED = ("mrla", "mrla", "proj")
_PROJ_SCAN = ("mrla_proj_scan",)


def unstack_scan_params(tree: Dict) -> Dict:
    """{'layerS_scan': stacked} -> per-block {'layerS_i': ...} (i >= 1)."""
    flat = flax.traverse_util.flatten_dict(tree)
    out = {}
    for key, v in flat.items():
        if key[0].endswith("_scan"):
            stage = key[0][: -len("_scan")]
            for i in range(v.shape[0]):
                sub = list(key[1:])
                if tuple(sub[:1]) == _PROJ_SCAN:
                    sub = list(_PROJ_UNROLLED) + sub[1:]
                out[(f"{stage}_{i + 1}", *sub)] = v[i]
        else:
            out[key] = v
    return flax.traverse_util.unflatten_dict(out)


def stack_scan_params(tree: Dict, layers) -> Dict:
    """Per-block {'layerS_i': ...} -> {'layerS_scan': stacked} for the
    nn.scan model.  ``layers`` is the stage block-count list."""
    flat = flax.traverse_util.flatten_dict(tree)
    out = {}
    # group non-first blocks per stage
    for stage_idx, blocks in enumerate(layers):
        stage = f"layer{stage_idx + 1}"
        if blocks <= 1:
            continue
        # collect the union of param paths from block 1
        paths = sorted(
            {k[1:] for k in flat if k[0] == f"{stage}_1"}
        )
        for path in paths:
            stacked = np.stack(
                [np.asarray(flat[(f"{stage}_{i}", *path)]) for i in
                 range(1, blocks)]
            )
            sub = list(path)
            if tuple(sub[: len(_PROJ_UNROLLED)]) == _PROJ_UNROLLED:
                sub = list(_PROJ_SCAN) + sub[len(_PROJ_UNROLLED):]
            out[(f"{stage}_scan", *sub)] = stacked
    # copy everything that is not a non-first stage block
    stacked_names = {
        f"layer{s + 1}_{i}"
        for s, blocks in enumerate(layers)
        for i in range(1, blocks)
    }
    for key, v in flat.items():
        if key[0] not in stacked_names:
            out[key] = v
    return flax.traverse_util.unflatten_dict(out)
