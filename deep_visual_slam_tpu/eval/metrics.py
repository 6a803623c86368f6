"""Streaming depth-metric accumulator.

Parity target: reference ``depth/util/metrics.py:3-154`` (``DepthMetrics``) —
running means of abs_diff / abs_rel / sq_rel / rmse / rmse_log / abs_log /
delta^1..3 over batches, with a min/max depth validity clamp.

Implemented as a plain Python accumulator over jnp/np batches (metrics are
scalars; no need for device residency), with the per-batch reduction jitted.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def _batch_metrics(pred: jnp.ndarray, gt: jnp.ndarray, valid: jnp.ndarray):
    w = valid.astype(jnp.float32)
    n = jnp.maximum(w.sum(), 1.0)
    gt_s = jnp.where(valid, gt, 1.0)
    pred_s = jnp.where(valid, pred, 1.0)

    def wsum(x):
        return jnp.sum(x * w)

    thresh = jnp.maximum(gt_s / pred_s, pred_s / gt_s)
    log_diff = jnp.log(gt_s) - jnp.log(pred_s)
    return {
        "count": n,
        "abs_diff": wsum(jnp.abs(gt_s - pred_s)),
        "abs_rel": wsum(jnp.abs(gt_s - pred_s) / gt_s),
        "sq_rel": wsum((gt_s - pred_s) ** 2 / gt_s),
        "se": wsum((gt_s - pred_s) ** 2),
        "se_log": wsum(log_diff**2),
        "abs_log": wsum(jnp.abs(log_diff)),
        "d1": wsum((thresh < 1.25).astype(jnp.float32)),
        "d2": wsum((thresh < 1.25**2).astype(jnp.float32)),
        "d3": wsum((thresh < 1.25**3).astype(jnp.float32)),
    }


class DepthMetrics:
    """Accumulate depth metrics across batches; ``result()`` finalizes.

    Metric definitions match ``depth/util/metrics.py:36-144`` and
    ``model/layers.py:251-268``.
    """

    def __init__(self, min_depth: float = 0.1, max_depth: float = 10.0):
        self.min_depth = min_depth
        self.max_depth = max_depth
        self.reset()

    def reset(self) -> None:
        self._sums: Dict[str, float] = {}

    def update(self, pred, gt, valid_mask=None) -> None:
        pred = jnp.asarray(pred, jnp.float32)
        gt = jnp.asarray(gt, jnp.float32)
        valid = (gt > self.min_depth) & (gt < self.max_depth)
        if valid_mask is not None:
            valid = valid & jnp.asarray(valid_mask, bool)
        pred = jnp.clip(pred, self.min_depth, self.max_depth)
        batch = jax.device_get(_batch_metrics(pred, gt, valid))
        for k, v in batch.items():
            self._sums[k] = self._sums.get(k, 0.0) + float(v)

    def result(self) -> Dict[str, float]:
        n = max(self._sums.get("count", 0.0), 1.0)
        s = self._sums
        return {
            "abs_diff": s.get("abs_diff", 0.0) / n,
            "abs_rel": s.get("abs_rel", 0.0) / n,
            "sq_rel": s.get("sq_rel", 0.0) / n,
            "rmse": float(np.sqrt(s.get("se", 0.0) / n)),
            "rmse_log": float(np.sqrt(s.get("se_log", 0.0) / n)),
            "abs_log": s.get("abs_log", 0.0) / n,
            "delta1": s.get("d1", 0.0) / n,
            "delta2": s.get("d2", 0.0) / n,
            "delta3": s.get("d3", 0.0) / n,
        }
