"""Core functional ops (L0 of the reference layer map, SURVEY.md §2.1).

Everything here is pure-functional jax.numpy on NHWC tensors; Flax modules in
``mrla_tpu.nn`` wrap these with parameter management.  The Pallas fused kernels
in ``mrla_tpu.kernels`` use these as their correctness oracles.
"""

from mrla_tpu.ops.common import eca_kernel_size, channel_conv1d, global_avg_pool
from mrla_tpu.ops.mrla import (
    mrla_light_attention,
    mrla_base_attention,
    la_eq4_attention,
)
from mrla_tpu.ops.linear_la import linear_la_step, linear_cla_step, linear_gla_step
from mrla_tpu.ops.channel_gates import eca_gate, se_gate
from mrla_tpu.ops.drop import drop_path

__all__ = [
    "eca_kernel_size",
    "channel_conv1d",
    "global_avg_pool",
    "mrla_light_attention",
    "mrla_base_attention",
    "la_eq4_attention",
    "linear_la_step",
    "linear_cla_step",
    "linear_gla_step",
    "eca_gate",
    "se_gate",
    "drop_path",
]
