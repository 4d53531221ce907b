"""Detection config presets mirroring the reference's MMDetection graft.

The reference contributes backbone + configs and delegates training to
upstream MMDetection (SURVEY.md §3.5).  The TPU scope is the jitted
backbone+neck export; these presets capture the backbone/neck/schedule
hyperparameters of each reference config file so a downstream detector can
consume identical features:

  * faster_rcnn_r50/r101mrlal_fpn_1x_coco
    (configs/_base_/models/faster_rcnn_r50mrlal_fpn.py:15-19 — FPN
    in [256,512,1024,2048] -> 256 x 5 levels, maxpool extra)
  * mask_rcnn_r50mrlal_fpn_1x_coco (same neck)
  * retinanet_r50mrlal_fpn_1x_coco
    (retinanet_r50mrlal_fpn.py — start_level=1, add_extra_convs='on_input')

Schedules: '1x' = 12 epochs, lr step at 8/11, batch 16 (README.md:88-92,
retinanet config :7 notes 8 img/gpu x 2).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence


@dataclass(frozen=True)
class DetectionPreset:
    name: str
    backbone_layers: Sequence[int]
    pretrained_arch: str  # classification checkpoint providing the weights
    frozen_stages: int
    norm_eval: bool
    fpn_out_channels: int
    num_outs: int
    start_level: int
    add_extra_convs: Optional[str]
    # 1x schedule
    epochs: int = 12
    lr_step_epochs: Sequence[int] = field(default=(8, 11))
    global_batch: int = 16
    image_scale: Sequence[int] = field(default=(1333, 800))


PRESETS = {
    "faster_rcnn_r50mrlal_fpn_1x_coco": DetectionPreset(
        name="faster_rcnn_r50mrlal_fpn_1x_coco",
        backbone_layers=(3, 4, 6, 3),
        pretrained_arch="resnet50_mrlal",
        frozen_stages=1,
        norm_eval=True,
        fpn_out_channels=256,
        num_outs=5,
        start_level=0,
        add_extra_convs=None,
    ),
    "faster_rcnn_r101mrlal_fpn_1x_coco": DetectionPreset(
        name="faster_rcnn_r101mrlal_fpn_1x_coco",
        backbone_layers=(3, 4, 23, 3),
        pretrained_arch="resnet101_mrlal",
        frozen_stages=1,
        norm_eval=True,
        fpn_out_channels=256,
        num_outs=5,
        start_level=0,
        add_extra_convs=None,
    ),
    "mask_rcnn_r50mrlal_fpn_1x_coco": DetectionPreset(
        name="mask_rcnn_r50mrlal_fpn_1x_coco",
        backbone_layers=(3, 4, 6, 3),
        pretrained_arch="resnet50_mrlal",
        frozen_stages=1,
        norm_eval=True,
        fpn_out_channels=256,
        num_outs=5,
        start_level=0,
        add_extra_convs=None,
    ),
    "retinanet_r50mrlal_fpn_1x_coco": DetectionPreset(
        name="retinanet_r50mrlal_fpn_1x_coco",
        backbone_layers=(3, 4, 6, 3),
        pretrained_arch="resnet50_mrlal",
        frozen_stages=1,
        norm_eval=True,
        fpn_out_channels=256,
        num_outs=5,
        start_level=1,
        add_extra_convs="on_input",
    ),
}


def build_backbone_fpn(preset_name: str, dtype=None):
    """Instantiate the jittable backbone+neck of a preset."""
    import jax.numpy as jnp

    from mrla_tpu.detect.backbone import MRLABackboneFPN

    p = PRESETS[preset_name]
    return MRLABackboneFPN(
        layers=tuple(p.backbone_layers),
        fpn_out_channels=p.fpn_out_channels,
        num_outs=p.num_outs,
        start_level=p.start_level,
        add_extra_convs=p.add_extra_convs,
        dtype=dtype or jnp.float32,
    )
