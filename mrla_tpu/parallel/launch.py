"""Multi-host launch + metric sync.

Replaces the reference's three launchers (SURVEY.md §2.4: mp.spawn
rendezvous resnet/train.py:127-154, env-var init deit/utils.py:216-238,
submitit/SLURM run_with_submitit.py) with ONE entry: each host runs the same
program; `init_distributed()` wires the JAX control plane (DCN); the mesh
spans all chips; GSPMD emits the ICI collectives.

SLURM preemption recovery (submitit checkpoint->requeue with --resume) maps
to: relaunch with --resume <output-dir>; the trainer restores epoch/best
from the orbax checkpoint (same contract, SURVEY.md §5.3).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize the multi-host control plane when launched per-host.

    No-ops for single-process runs.  Args fall back to the standard env vars
    (COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID) and the SLURM ones
    jax.distributed understands natively.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    num_processes = num_processes or int(os.environ.get("NUM_PROCESSES", "0")) or None
    process_id = (
        process_id
        if process_id is not None
        else (int(os.environ["PROCESS_ID"]) if "PROCESS_ID" in os.environ else None)
    )
    if coordinator_address or "SLURM_JOB_ID" in os.environ:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        if jax.process_count() > 1:
            # Establish the collective transport (gloo TCP pairs on the CPU
            # backend) NOW, while every rank is in lockstep on a trivially
            # compiled program.  Without this, the first collective is inside
            # the fully compiled train step, which ranks reach at wildly
            # different times (compile skew under load) — and the transport's
            # pair-connect timeout is shorter than a big XLA compile, so rank
            # 0 dies with "Gloo context initialization failed: Connect
            # timeout" while rank 1 is still compiling.
            from jax.experimental import multihost_utils

            multihost_utils.sync_global_devices("mrla_tpu:init_distributed")
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": jax.local_device_count(),
        "global_devices": jax.device_count(),
    }


def is_main_process() -> bool:
    """Rank-0 gate for checkpoint writes and logging (the reference's
    save_on_master / master-only print, deit/utils.py:172-213)."""
    return jax.process_index() == 0


def all_gather_metrics(metrics: dict) -> dict:
    """Cross-host metric sync (the reference's dist.all_reduce on meters,
    deit/utils.py:36-47): sums scalar metrics over processes."""
    if jax.process_count() == 1:
        return metrics
    from jax.experimental import multihost_utils

    keys = sorted(metrics)
    vec = np.asarray([float(metrics[k]) for k in keys], np.float32)
    summed = multihost_utils.process_allgather(vec).sum(axis=0)
    return dict(zip(keys, summed.tolist()))
