"""MRLA backbone -> FPN export with MMDetection contract semantics.

Reference behavior (mmdetection/mmdet/models/backbones/resnet_mrlal.py):
  * forward returns the (C2, C3, C4, C5) pyramid tuple (:276-296);
  * the block epilogue has NO DropPath (:86,:116) — use_drop_path=False;
  * frozen_stages stops gradients for the stem + stages 1..k (:307-323) —
    functional JAX equivalent: an optax mask from ``freeze_mask``;
  * norm_eval freezes BN running stats during training (:358-367) — the
    functional equivalent here: apply the backbone with train=False (the
    export path has no dropout/droppath, so train=False is exactly
    frozen-BN inference semantics);
  * weights load from classification checkpoints (init_cfg Pretrained,
    configs/_base_/models/faster_rcnn_r50mrlal_fpn.py:14) — use
    mrla_tpu.ckpt.convert_resnet_state_dict on the .pth.tar and feed the
    same params (head ignored by features_only).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from mrla_tpu.detect.fpn import FPN
from mrla_tpu.models.resnet_mrla_light import ResNetMRLALight


class MRLABackboneFPN(nn.Module):
    """ResNet_mrlal backbone (features_only) + FPN neck, jointly jittable."""

    layers: Sequence[int] = (3, 4, 6, 3)
    fpn_out_channels: int = 256
    num_outs: int = 5
    start_level: int = 0
    add_extra_convs: Optional[str] = None  # retinanet: "on_input", start_level=1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False):
        feats = ResNetMRLALight(
            layers=list(self.layers),
            features_only=True,
            use_drop_path=False,  # mmdet epilogue has no DropPath
            dtype=self.dtype,
            name="backbone",
        )(x, train)
        return FPN(
            out_channels=self.fpn_out_channels,
            num_outs=self.num_outs,
            start_level=self.start_level,
            add_extra_convs=self.add_extra_convs,
            dtype=self.dtype,
            name="neck",
        )(feats)


def load_backbone_from_classification(
    det_variables, cls_variables, backbone_scope: str = "backbone"
):
    """Graft classification-checkpoint weights into the backbone+FPN tree.

    The reference initializes the mmdet backbone from a classification
    .pth.tar via init_cfg=Pretrained (faster_rcnn_r50mrlal_fpn.py:14) —
    state-dict keys match because the backbone IS the classification trunk.
    Here the equivalent: copy every backbone-scope entry present in the
    classification tree (stem + layer*; fc/head entries absent from the
    features_only module are ignored), leave the neck at its init.

    det_variables: init tree of MRLABackboneFPN ({"params": {"backbone":
    ..., "neck": ...}, "batch_stats": {...}}); cls_variables: tree from
    `convert_resnet_state_dict` or a trained run (unscoped).
    Returns a new det tree; raises if a backbone param is missing from the
    classification tree or has mismatched shape.
    """
    import flax

    out = {}
    for col in det_variables:
        det_col = flax.traverse_util.flatten_dict(det_variables[col])
        cls_col = (
            flax.traverse_util.flatten_dict(cls_variables[col])
            if col in cls_variables
            else {}
        )
        new_col = {}
        for key, val in det_col.items():
            if key[0] == backbone_scope:
                src = cls_col.get(key[1:])
                if src is None:
                    raise KeyError(
                        f"classification checkpoint lacks {'/'.join(key[1:])}"
                    )
                if tuple(src.shape) != tuple(val.shape):
                    raise ValueError(
                        f"shape mismatch at {'/'.join(key)}: "
                        f"{src.shape} vs {val.shape}"
                    )
                new_col[key] = src
            else:
                new_col[key] = val
        out[col] = flax.traverse_util.unflatten_dict(new_col)
    return out


def freeze_mask(params, frozen_stages: int, backbone_scope: str = "backbone"):
    """optax-style mask: True = trainable, False = frozen.

    frozen_stages semantics match the reference: -1 freezes nothing; 0
    freezes the stem; k >= 1 additionally freezes layer1..layerk.
    """

    def trainable(path_key: str) -> bool:
        if frozen_stages < 0:
            return True
        if path_key.startswith("stem"):
            return False
        for s in range(1, frozen_stages + 1):
            if path_key.startswith(f"layer{s}_"):
                return False
        return True

    import flax

    flat = flax.traverse_util.flatten_dict(params)
    mask = {}
    for key, _ in flat.items():
        # key like ("backbone", "layer1_0", ...) or top-level for the neck
        if key[0] == backbone_scope:
            mask[key] = trainable(key[1])
        else:
            mask[key] = True
    return flax.traverse_util.unflatten_dict(mask)
