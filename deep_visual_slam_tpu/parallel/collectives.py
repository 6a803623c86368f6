"""Thin collective wrappers used by trainers under `shard_map`.

Under plain `jit` + `NamedSharding` (the default path) XLA GSPMD inserts all
collectives automatically and none of these are needed. They exist for
explicitly-scheduled code (`shard_map` regions, Pallas ring kernels) and to
give the trainer a single audited surface for cross-chip communication —
psum for gradients, all_gather for eval metrics (SURVEY.md §5.8).

Validated against the GSPMD path by ``tests/test_parallel.py``: a
``shard_map``-explicit DP gradient step (psum) must produce the same update
as the jit+NamedSharding trainer step, and ``all_gather`` must reconstruct
the global eval batch on every device.

jax 0.8 caveat (pinned by the tests): with default VMA checking
(``check_vma=True``), AD inside ``shard_map`` auto-inserts the gradient psum
for replicated inputs — explicit psum on gradients belongs only in
``check_vma=False`` regions, or it double-counts.
"""

from __future__ import annotations

from typing import Any

import jax
from jax import lax

from deep_visual_slam_tpu.parallel.mesh import DATA_AXIS


def psum(tree: Any, axis_name: str = DATA_AXIS) -> Any:
    """Sum a pytree across an axis (gradient reduction)."""
    return jax.tree_util.tree_map(lambda x: lax.psum(x, axis_name), tree)


def pmean(tree: Any, axis_name: str = DATA_AXIS) -> Any:
    """Mean a pytree across an axis (loss/metric averaging)."""
    return jax.tree_util.tree_map(lambda x: lax.pmean(x, axis_name), tree)


def all_gather(tree: Any, axis_name: str = DATA_AXIS, axis: int = 0) -> Any:
    """Gather per-device values along a new leading axis (eval metrics)."""
    return jax.tree_util.tree_map(
        lambda x: lax.all_gather(x, axis_name, axis=axis), tree
    )
