"""Optimized detection feature export: BN-folded backbone + bf16 FPN.

The reference's detection scope is the jitted backbone+neck export feeding
upstream MMDetection heads (SURVEY.md §3.5).  Round 2 benchmarked the plain
Flax module at COCO size (216 img/s, bs8 800x1344 bf16); this engine applies
the classification serving tricks to that path:

  * backbone: the BN-folded, pre-cast resnet_mrlal serving trunk
    (serving/resnet_mrlal.py) — identical math to
    ResNetMRLALight(features_only=True).apply(train=False), without
    normalization work or per-step casts.  The mmdet backbone variant has
    no DropPath (resnet_mrlal.py:86,116), which is inference-identical to
    the classification trunk, so the same folded params serve both.
  * neck: mmdet FPN has NO norm layers (configs/_base_/models/
    faster_rcnn_r50mrlal_fpn.py:15-19), so its conv params are simply
    pre-cast to bf16 and applied functionally.
  * microbatch chains (the +45% classification trick) are exposed for the
    COCO batch; measured verdicts live in ROADMAP.md.

Numerics: parity-tested against MRLABackboneFPN.apply in
tests/test_serving_detect.py.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp

from mrla_tpu.serving.resnet_mrlal import _trunk_impl, prepare_inference_params


def prepare_detect_params(
    det_variables: Dict,
    layers: Sequence[int] = (3, 4, 6, 3),
    dtype=jnp.bfloat16,
) -> Dict:
    """Fold/cast an MRLABackboneFPN variable tree for serving.

    det_variables: {"params": {"backbone": ..., "neck": ...},
    "batch_stats": {"backbone": ...}} as produced by MRLABackboneFPN.init
    (or grafted via detect.load_backbone_from_classification)."""
    backbone = {
        "params": det_variables["params"]["backbone"],
        "batch_stats": det_variables["batch_stats"]["backbone"],
    }
    trunk = prepare_inference_params(backbone, layers=layers, dtype=dtype,
                                     with_head=False)
    neck = jax.tree.map(
        lambda a: jnp.asarray(a, dtype), det_variables["params"]["neck"]
    )
    return {"trunk": trunk, "neck": neck}


def _conv(x, p, stride=1):
    k = p["kernel"]
    pad = k.shape[0] // 2
    y = jax.lax.conv_general_dilated(
        x, k.astype(x.dtype), (stride, stride),
        ((pad, pad), (pad, pad)) if pad else "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + p["bias"].astype(y.dtype)


def _upsample_nearest_to(x, h_out, w_out):
    b, h, w, c = x.shape
    if (h_out, w_out) == (2 * h, 2 * w):
        x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
        return x.reshape(b, 2 * h, 2 * w, c)
    rows = jnp.floor(jnp.arange(h_out) * (h / h_out)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w_out) * (w / w_out)).astype(jnp.int32)
    return x[:, rows][:, :, cols]


def _fpn_apply(neck: Dict, inputs, num_outs: int, start_level: int,
               add_extra_convs):
    """Functional mirror of detect/fpn.py's FPN on a pre-cast param tree."""
    used = list(inputs[start_level:])
    if num_outs < len(used):
        used = used[:num_outs]
    n = len(used)
    laterals = [_conv(used[i], neck[f"lateral{i}"]) for i in range(n)]
    for i in range(n - 1, 0, -1):
        _, th, tw, _ = laterals[i - 1].shape
        laterals[i - 1] = laterals[i - 1] + _upsample_nearest_to(
            laterals[i], th, tw
        )
    outs = [_conv(laterals[i], neck[f"fpn_conv{i}"]) for i in range(n)]
    while len(outs) < num_outs:
        if add_extra_convs is None:
            outs.append(
                jax.lax.reduce_window(
                    outs[-1], -jnp.inf, jax.lax.max,
                    (1, 1, 1, 1), (1, 2, 2, 1), "VALID",
                )
            )
        else:
            src = (
                used[-1]
                if add_extra_convs == "on_input" and len(outs) == n
                else outs[-1]
            )
            outs.append(_conv(src, neck[f"extra_conv{len(outs)}"], stride=2))
    return tuple(outs)


@functools.partial(
    jax.jit,
    static_argnames=(
        "layers", "dim_perhead", "num_outs", "start_level",
        "add_extra_convs", "microbatch", "use_pallas",
    ),
)
def detect_forward(
    serving_params: Dict,
    x: jax.Array,
    layers: Sequence[int] = (3, 4, 6, 3),
    dim_perhead: int = 32,
    num_outs: int = 5,
    start_level: int = 0,
    add_extra_convs=None,
    microbatch: int = 0,
    use_pallas: bool = False,
):
    """[B, H, W, 3] -> tuple of num_outs pyramid levels (serving dtype)."""

    def one(chunk):
        feats = _trunk_impl(
            serving_params["trunk"], chunk, layers, dim_perhead, use_pallas
        )
        return _fpn_apply(
            serving_params["neck"], feats, num_outs, start_level,
            add_extra_convs,
        )

    if microbatch and x.shape[0] > microbatch and x.shape[0] % microbatch == 0:
        n = x.shape[0] // microbatch
        parts = [one(x[i * microbatch:(i + 1) * microbatch]) for i in range(n)]
        return tuple(
            jnp.concatenate([p[lvl] for p in parts], axis=0)
            for lvl in range(num_outs)
        )
    return one(x)
