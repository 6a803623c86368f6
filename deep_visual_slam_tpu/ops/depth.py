"""Disparity/depth conversions, depth error metrics, SILog loss.

Parity targets:
  - disp_to_depth: reference ``vo/learner_func.py:16-26``
  - compute_depth_errors: reference ``model/layers.py:251-268``
  - silog_loss: reference ``depth/depth_learner.py:74-94``
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp


def disp_to_depth(
    disp: jnp.ndarray, min_depth: float, max_depth: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sigmoid disparity in [0, 1] -> (scaled_disp, depth).

    depth ranges over [min_depth, max_depth] (reference
    ``vo/learner_func.py:16-26``).
    """
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = min_disp + (max_disp - min_disp) * disp
    depth = 1.0 / scaled_disp
    return scaled_disp, depth


def depth_to_disp(depth: jnp.ndarray, min_depth: float, max_depth: float) -> jnp.ndarray:
    """Inverse of :func:`disp_to_depth` (maps depth back to sigmoid units)."""
    min_disp = 1.0 / max_depth
    max_disp = 1.0 / min_depth
    scaled_disp = 1.0 / depth
    return (scaled_disp - min_disp) / (max_disp - min_disp)


def compute_depth_errors(gt: jnp.ndarray, pred: jnp.ndarray) -> dict:
    """Standard seven depth metrics over already-masked/flattened values.

    Returns dict with abs_rel, sq_rel, rmse, rmse_log, a1, a2, a3
    (reference ``model/layers.py:251-268``).
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    thresh = jnp.maximum(gt / pred, pred / gt)
    a1 = jnp.mean((thresh < 1.25).astype(jnp.float32))
    a2 = jnp.mean((thresh < 1.25**2).astype(jnp.float32))
    a3 = jnp.mean((thresh < 1.25**3).astype(jnp.float32))
    rmse = jnp.sqrt(jnp.mean((gt - pred) ** 2))
    rmse_log = jnp.sqrt(jnp.mean((jnp.log(gt) - jnp.log(pred)) ** 2))
    abs_rel = jnp.mean(jnp.abs(gt - pred) / gt)
    sq_rel = jnp.mean((gt - pred) ** 2 / gt)
    return {
        "abs_rel": abs_rel,
        "sq_rel": sq_rel,
        "rmse": rmse,
        "rmse_log": rmse_log,
        "a1": a1,
        "a2": a2,
        "a3": a3,
    }


def masked_depth_errors(
    gt: jnp.ndarray, pred: jnp.ndarray, valid: jnp.ndarray
) -> dict:
    """Depth metrics with a validity mask — fixed-shape (TPU-friendly) variant.

    Unlike the reference's boolean-index gather (``depth/depth_learner.py:88``),
    invalid pixels are neutralized by a weighted mean so shapes stay static
    under jit.
    """
    gt = gt.astype(jnp.float32)
    pred = pred.astype(jnp.float32)
    w = valid.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    gt_safe = jnp.where(valid, gt, 1.0)
    pred_safe = jnp.where(valid, pred, 1.0)

    def wmean(x):
        return jnp.sum(x * w) / n

    thresh = jnp.maximum(gt_safe / pred_safe, pred_safe / gt_safe)
    a1 = wmean((thresh < 1.25).astype(jnp.float32))
    a2 = wmean((thresh < 1.25**2).astype(jnp.float32))
    a3 = wmean((thresh < 1.25**3).astype(jnp.float32))
    rmse = jnp.sqrt(wmean((gt_safe - pred_safe) ** 2))
    log_d = jnp.log(gt_safe) - jnp.log(pred_safe)
    rmse_log = jnp.sqrt(wmean(log_d**2))
    abs_rel = wmean(jnp.abs(gt_safe - pred_safe) / gt_safe)
    sq_rel = wmean((gt_safe - pred_safe) ** 2 / gt_safe)
    return {
        "abs_rel": abs_rel,
        "sq_rel": sq_rel,
        "rmse": rmse,
        "rmse_log": rmse_log,
        "a1": a1,
        "a2": a2,
        "a3": a3,
    }


def silog_loss(
    prediction: jnp.ndarray,
    target: jnp.ndarray,
    valid_mask: jnp.ndarray,
    variance_focus: float = 0.85,
) -> jnp.ndarray:
    """Scale-invariant log loss (reference ``depth/depth_learner.py:74-94``).

    sqrt( mean(d^2) - variance_focus * mean(d)^2 ), d = log(pred) - log(gt),
    over valid pixels only. Static-shape masked reduction instead of the
    reference's boolean gather.
    """
    eps = 1e-6
    pred = jnp.maximum(prediction.astype(jnp.float32), eps)
    tgt = jnp.maximum(target.astype(jnp.float32), eps)
    w = valid_mask.astype(jnp.float32)
    n = jnp.maximum(jnp.sum(w), 1.0)
    d = jnp.where(valid_mask, jnp.log(pred) - jnp.log(tgt), 0.0)
    d2_mean = jnp.sum(d * d) / n
    d_mean = jnp.sum(d) / n
    silog = d2_mean - variance_focus * d_mean * d_mean
    return jnp.sqrt(jnp.maximum(silog, eps))
