"""Multi-host initialization (SURVEY.md §5.8).

The reference is single-process/single-GPU (``vo/train.py:423-431`` selects
one CUDA device; no NCCL/MPI anywhere). The TPU-native distributed story is:

  1. ``init_distributed()`` — ``jax.distributed.initialize`` on multi-host
     pods (no-op at world size 1, so single-host runs need no flags);
  2. a ``jax.sharding.Mesh`` over the global device set
     (:mod:`deep_visual_slam_tpu.parallel.mesh`), batch axis sharded; XLA
     GSPMD inserts gradient all-reduces over ICI/DCN automatically;
  3. explicit collectives (:mod:`deep_visual_slam_tpu.parallel.collectives`)
     only inside ``shard_map`` regions that need hand-scheduled comms.

Both trainers call :func:`init_distributed` at construction.
"""

from __future__ import annotations

import os
from typing import Optional

import jax

_INITIALIZED = False


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> int:
    """Initialize multi-host JAX; returns the process count.

    Resolution order: explicit args > environment
    (``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``,
    or cloud-TPU auto-detection inside ``jax.distributed.initialize``) >
    single-process no-op. Safe to call more than once.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return jax.process_count()

    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_n = os.environ.get("JAX_NUM_PROCESSES")
    num_processes = num_processes if num_processes is not None else (
        int(env_n) if env_n else None
    )
    env_id = os.environ.get("JAX_PROCESS_ID")
    process_id = process_id if process_id is not None else (
        int(env_id) if env_id else None
    )

    if coordinator_address is None and num_processes in (None, 1):
        # Pod auto-detection only when NOTHING was requested explicitly:
        # num_processes=1 (arg or JAX_NUM_PROCESSES=1) is an explicit
        # single-process request and must stay a no-op even on a pod
        # worker (resolution order: explicit args > environment).
        if num_processes is None and _looks_multihost_tpu():
            # Cloud-TPU pod slice with no explicit flags: let
            # jax.distributed.initialize() auto-detect coordinator/world
            # size from the TPU environment (the normal multi-host flow).
            jax.distributed.initialize()
            _INITIALIZED = True
            return jax.process_count()
        # Single host: nothing to initialize; mesh over local devices.
        _INITIALIZED = True
        return 1

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _INITIALIZED = True
    return jax.process_count()


def _looks_multihost_tpu() -> bool:
    """True on a multi-worker cloud-TPU environment (pod slice).

    Signals: ``DVS_DISTRIBUTED=1`` forces auto-init;
    ``TPU_WORKER_HOSTNAMES``/``TPU_WORKER_IDS`` listing >1 worker (set by
    the TPU runtime on GCE/GKE pod slices); ``MEGASCALE_NUM_SLICES`` > 1.
    Single-worker v5e-1..8 hosts stay in the no-op path.
    """
    if os.environ.get("DVS_DISTRIBUTED", "").strip().lower() in (
        "1", "true", "yes", "on",
    ):
        return True
    for var in ("TPU_WORKER_HOSTNAMES", "TPU_WORKER_IDS"):
        v = os.environ.get(var, "")
        if "," in v.strip().strip(","):
            return True
    try:
        if int(os.environ.get("MEGASCALE_NUM_SLICES", "1")) > 1:
            return True
    except ValueError:
        pass
    return False
