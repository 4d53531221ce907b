"""Device-mesh construction and GSPMD sharding rules.

The reference's entire distributed layer (~150 LoC of NCCL/DDP rank
bookkeeping, SURVEY.md §2.5) collapses here into mesh construction +
sharding annotations: XLA emits the collectives.
"""

from mrla_tpu.parallel.mesh import (
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
    local_mesh,
)
from mrla_tpu.parallel.sharding import tp_shardings, shard_train_state
from mrla_tpu.parallel.pipeline import (
    make_pipelined_vit,
    pipeline_shardings,
    stack_block_params,
    unstack_block_params,
)

__all__ = [
    "make_mesh",
    "batch_sharding",
    "replicated",
    "shard_batch",
    "local_mesh",
    "tp_shardings",
    "shard_train_state",
    "make_pipelined_vit",
    "pipeline_shardings",
    "stack_block_params",
    "unstack_block_params",
]
