"""Detection-side export: MRLA backbone feature pyramid + FPN neck.

Scope per BASELINE.json: the backbone + FPN feature export in jitted XLA,
matching the MMDetection backbone contract — not a full detection framework.
"""

from mrla_tpu.detect.fpn import FPN
from mrla_tpu.detect.backbone import (
    MRLABackboneFPN,
    freeze_mask,
    load_backbone_from_classification,
)

__all__ = [
    "FPN",
    "MRLABackboneFPN",
    "freeze_mask",
    "load_backbone_from_classification",
]
