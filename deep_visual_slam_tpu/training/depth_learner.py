"""Supervised metric-depth loss core (SILog + edge-aware smoothness).

Parity target: reference ``depth/depth_learner.py``:
  - disp -> depth over [min_depth, max_depth] (``:32-38``),
  - per-scale bilinear upsample to label resolution (``:107``),
  - SILog with variance focus 0.85 (``:74-94``),
  - mean-normalized edge-aware smoothness (``:51-72``),
  - scale weights [1, 0.5, 0.25, 0.125], silog weight 1.0 / smooth 0.1
    (``:25-29,116``).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Tuple

import jax.numpy as jnp

from deep_visual_slam_tpu.ops import disp_to_depth, resize_bilinear, silog_loss
from deep_visual_slam_tpu.ops.photometric import smooth_loss


@dataclass(frozen=True)
class DepthLossConfig:
    num_scales: int = 4
    min_depth: float = 0.1
    max_depth: float = 10.0
    alphas: Tuple[float, ...] = (1.0, 0.5, 0.25, 0.125)
    smooth_weight: float = 0.1
    silog_weight: float = 1.0
    variance_focus: float = 0.85

    @classmethod
    def from_config(cls, config: dict) -> "DepthLossConfig":
        t = config["Train"]
        return cls(
            min_depth=t["min_depth"],
            max_depth=t["max_depth"],
            smooth_weight=t.get("smooth_weight", 0.1),
            silog_weight=t.get("silog_weight", 1.0),
        )


def _normalized_smooth(depth: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Smoothness on mean-normalized prediction, clamp min 1e-7
    (reference ``depth/depth_learner.py:56-58``)."""
    mean = jnp.maximum(jnp.mean(depth, axis=(1, 2), keepdims=True), 1e-7)
    return smooth_loss(depth / mean, img)


def multi_scale_loss(
    pred_depths: List[jnp.ndarray],
    gt_depth: jnp.ndarray,
    rgb: jnp.ndarray,
    valid_mask: jnp.ndarray,
    cfg: DepthLossConfig,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Weighted sum of per-scale (SILog, smoothness)."""
    H, W = gt_depth.shape[1:3]
    total_smooth = 0.0
    total_silog = 0.0
    for pred, alpha in zip(pred_depths, cfg.alphas):
        pred_up = resize_bilinear(pred, H, W)
        total_smooth = total_smooth + alpha * _normalized_smooth(pred_up, rgb)
        total_silog = total_silog + alpha * silog_loss(
            pred_up, gt_depth, valid_mask, cfg.variance_focus
        )
    total = cfg.silog_weight * total_silog + cfg.smooth_weight * total_smooth
    return total, total_silog, total_smooth


def forward_step(
    depth_apply,
    depth_vars,
    sample: Dict[str, jnp.ndarray],
    cfg: DepthLossConfig,
    train: bool = False,
):
    """Forward + loss (reference ``depth/depth_learner.py:119-147``).

    sample: {"image": [B,H,W,3], "depth": [B,H,W,1], "valid_mask": [B,H,W,1]}.
    Returns (total_loss, {"silog", "smooth", "loss"}, pred_depths).
    """
    rgb = sample["image"]
    gt = sample["depth"]
    valid = sample["valid_mask"]
    if gt.ndim == 3:
        gt = gt[..., None]
    if valid.ndim == 3:
        valid = valid[..., None]

    outputs = depth_apply(depth_vars, rgb, train)
    pred_depths = []
    for s in range(cfg.num_scales):
        _, depth = disp_to_depth(outputs[("disp", s)], cfg.min_depth, cfg.max_depth)
        pred_depths.append(depth)

    total, silog, smooth = multi_scale_loss(pred_depths, gt, rgb, valid, cfg)
    losses = {"loss": total, "silog": silog, "smooth": smooth}
    return total, losses, pred_depths
