"""Distributed backend: device mesh + shardings, explicit collectives for
``shard_map`` regions, and multi-host initialization (SURVEY.md §2.6/§5.8)."""

from deep_visual_slam_tpu.parallel.collectives import all_gather, pmean, psum
from deep_visual_slam_tpu.parallel.distributed import init_distributed
from deep_visual_slam_tpu.parallel.mesh import (
    DATA_AXIS,
    MODEL_AXIS,
    batch_sharding,
    make_mesh,
    replicate,
    replicated,
    shard_batch,
)

__all__ = [
    "DATA_AXIS",
    "MODEL_AXIS",
    "all_gather",
    "batch_sharding",
    "init_distributed",
    "make_mesh",
    "pmean",
    "psum",
    "replicate",
    "replicated",
    "shard_batch",
]
