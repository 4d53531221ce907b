"""Serving path: hand-scheduled inference engines over trained param trees.

Training and fine-tuning run through the Flax models; serving runs through
these functional forwards — BNs folded into conv weights at load time and
the batch traced as independent microbatch chains so XLA overlaps each
chain's MRLA gate barrier with other chains' conv compute (the measured
fast path; the Pallas epilogue kernels remain available via use_pallas but
lose in-model — see ROADMAP.md perf ledger).  `make_sharded_forward` scales
any engine over a device mesh; `cli.py` is the user-facing eval entry.
"""

from mrla_tpu.serving.detect import (
    detect_forward,
    prepare_detect_params,
)
from mrla_tpu.serving.deit import (
    deit_forward,
    precast_forward,
    prepare_deit_inference_params,
    prepare_precast_inference_params,
)
from mrla_tpu.serving.resnet_mrlab import (
    prepare_mrlab_inference_params,
    resnet_mrlab_forward,
)
from mrla_tpu.serving.resnet_mrlal import (
    prepare_inference_params,
    resnet_mrlal_forward,
)
from mrla_tpu.serving.sharded import make_sharded_forward

__all__ = [
    "deit_forward",
    "detect_forward",
    "prepare_detect_params",
    "make_sharded_forward",
    "precast_forward",
    "prepare_deit_inference_params",
    "prepare_precast_inference_params",
    "prepare_inference_params",
    "prepare_mrlab_inference_params",
    "resnet_mrlab_forward",
    "resnet_mrlal_forward",
]
