"""Device mesh + sharding helpers — the framework's "distributed backend".

The reference is single-process / single-GPU (SURVEY.md §2.6: no NCCL / MPI /
torch.distributed anywhere); its only parallelism is CPU DataLoader workers.
The TPU-native equivalent is a `jax.sharding.Mesh` over all chips with the
batch axis sharded ("data" axis) and parameters replicated. XLA GSPMD then
inserts the gradient all-reduce over ICI automatically — there is no
hand-written communication code to maintain.

Axes:
  data   — batch sharding (the only axis the VO workload needs; ResNet-18
           fits on-chip with room to spare).
  model  — reserved tensor-parallel axis, size 1 by default, so larger
           backbones can shard without API changes.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    data_parallel: Optional[int] = None,
    model_parallel: int = 1,
) -> Mesh:
    """Build a (data, model) mesh over the given (default: all) devices.

    On a multi-chip TPU slice `jax.devices()` is ordered so that adjacent
    devices share ICI links; a trailing model axis keeps tensor-parallel
    collectives on the fastest links.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data_parallel is None:
        data_parallel = n // model_parallel
    if data_parallel * model_parallel != n:
        raise ValueError(
            f"mesh {data_parallel}x{model_parallel} != {n} devices"
        )
    arr = np.asarray(devices).reshape(data_parallel, model_parallel)
    return Mesh(arr, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) dim across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Any, mesh: Mesh) -> Any:
    """Place a host pytree onto the mesh, batch-dim sharded across "data".

    Per-host data loading: each process calls this with its local shard; in a
    single-process test it distributes the global batch.
    """
    sharding = batch_sharding(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a pytree (params/opt state) across the mesh."""
    sharding = replicated(mesh)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), tree
    )
