"""Self-supervised VO loss core (Monodepth2-style), pure functions.

Parity target: reference ``vo/learner_new.py`` (``MonodepthTrainer``):
  - depth forward on the target frame -> 4-scale sigmoid disparity,
  - pose forward on both pairs: (left, target) with invert=True and
    (target, right) with invert=False (``vo/learner_new.py:107-129``),
  - per scale: bilinear-upsample disp to full res, disp->depth,
    backproject -> rigid transform -> project -> bilinear warp of the source
    (``vo/learner_new.py:132-172``),
  - loss: min over {identity, predicted} SSIM+L1 reprojection maps
    (auto-masking; tie-break noise ``randn * 1e-5``,
    ``vo/learner_new.py:212-242``) + edge-aware smoothness
    ``smoothness_ratio / 2**scale`` on mean-normalized full-res disparity
    (``vo/learner_new.py:246-252``), averaged over 4 scales.

TPU-native design: everything is a pure jnp function over NHWC batches,
jitted by the trainer; the warp for both frame directions is vmapped into a
single batched gather instead of a Python loop over frame ids.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.ops import (
    backproject,
    disp_to_depth,
    grid_sample,
    project,
    reprojection_loss,
    resize_bilinear,
    transformation_from_parameters,
)
from deep_visual_slam_tpu.ops.photometric import normalized_smooth_loss


@dataclass(frozen=True)
class VOLossConfig:
    """Hyperparameters, defaults = reference ``vo/config.yaml:33-48``."""

    num_scales: int = 4
    min_depth: float = 0.1
    max_depth: float = 10.0
    ssim_ratio: float = 0.85
    smoothness_ratio: float = 1e-3
    auto_mask: bool = True
    # D3VO heteroscedastic photometric uncertainty (Yang et al. 2020, Eq.5;
    # Kendall & Gal form): the DepthNet ("unc", 0) sigma head divides the
    # min-reprojection residual and pays a +log(sigma) regularizer —
    # sigma learns the per-pixel photometric-violation level, and at SLAM
    # time feeds the BA Eq.13 weights (slam/monovo.py Networks docstring).
    # The reference STORES per-frame uncertainty but never produces it
    # (/root/reference/slam/MonoVO.py:19-27 feeds zeros).
    uncertainty: bool = False

    @classmethod
    def from_config(cls, config: dict) -> "VOLossConfig":
        t = config["Train"]
        return cls(
            num_scales=t.get("num_scale", 4),
            min_depth=t["min_depth"],
            max_depth=t["max_depth"],
            ssim_ratio=t["ssim_ratio"],
            smoothness_ratio=t["smoothness_ratio"],
            auto_mask=t.get("auto_mask", True),
            uncertainty=t.get("predict_uncertainty", False),
        )


def predict_poses(
    pose_apply, pose_vars, batch: Dict[str, jnp.ndarray], train: bool = False
) -> Dict[Any, jnp.ndarray]:
    """Run PoseNet on both frame pairs; both pairs in ONE batched forward.

    Reference runs two sequential forwards (``vo/learner_new.py:107-129``);
    here the (left,target) and (target,right) pairs are stacked on the batch
    axis so the encoder runs once at 2B — better MXU utilization and one
    BatchNorm statistics pass.
    """
    left = batch["source_left"]
    target = batch["target_image"]
    right = batch["source_right"]
    B = target.shape[0]

    pair_lt = jnp.concatenate([left, target], axis=-1)
    pair_tr = jnp.concatenate([target, right], axis=-1)
    pairs = jnp.concatenate([pair_lt, pair_tr], axis=0)  # [2B, H, W, 6]

    axisangle, translation = pose_apply(pose_vars, pairs, train)
    aa = axisangle[:, 0, 0, :]  # [2B, 3]
    t = translation[:, 0, 0, :]

    outputs = {
        ("axisangle", 0, -1): axisangle[:B],
        ("translation", 0, -1): translation[:B],
        ("axisangle", 0, 1): axisangle[B:],
        ("translation", 0, 1): translation[B:],
        # Left->target is predicted forward then inverted (frame id < 0),
        # matching the reference's invert rule (vo/learner_new.py:123-127).
        ("cam_T_cam", 0, -1): transformation_from_parameters(
            aa[:B], t[:B], invert=True
        ),
        ("cam_T_cam", 0, 1): transformation_from_parameters(
            aa[B:], t[B:], invert=False
        ),
    }
    return outputs


def generate_images_pred(
    batch: Dict[str, jnp.ndarray],
    outputs: Dict[Any, jnp.ndarray],
    cfg: VOLossConfig,
) -> None:
    """Per-scale warp of both sources into the target frame.

    Mirrors ``vo/learner_new.py:132-172``: each scale's disparity is
    upsampled to full resolution and warped at full resolution.
    """
    target = batch["target_image"]
    B, H, W, _ = target.shape
    K = batch["K"]
    inv_K = batch["inv_K"]

    for scale in range(cfg.num_scales):
        disp_up = resize_bilinear(outputs[("disp", scale)], H, W)
        outputs[("disp_up", scale)] = disp_up
        _, depth = disp_to_depth(disp_up, cfg.min_depth, cfg.max_depth)
        outputs[("depth", scale)] = depth

        cam_points = backproject(depth, inv_K)
        for frame_id, source in ((-1, batch["source_left"]), (1, batch["source_right"])):
            T = outputs[("cam_T_cam", 0, frame_id)]
            grid = project(cam_points, K, T)
            outputs[("sample", frame_id, scale)] = grid
            outputs[("color", frame_id, scale)] = grid_sample(
                source, grid, align_corners=True, padding_mode="border"
            )


def compute_losses(
    batch: Dict[str, jnp.ndarray],
    outputs: Dict[Any, jnp.ndarray],
    cfg: VOLossConfig,
    rng: jax.Array,
) -> Dict[str, jnp.ndarray]:
    """Min-reprojection auto-masked loss + smoothness over all scales.

    Mirrors ``vo/learner_new.py:175-257``. ``rng`` drives the auto-mask
    tie-break noise (the reference uses ``torch.randn * 1e-5``,
    ``vo/learner_new.py:228-229``).
    """
    target = batch["target_image"]
    losses: Dict[str, jnp.ndarray] = {}
    total_loss = 0.0

    # Identity reprojection maps are scale-independent: compute once.
    identity = jnp.concatenate(
        [
            reprojection_loss(batch["source_left"], target, cfg.ssim_ratio),
            reprojection_loss(batch["source_right"], target, cfg.ssim_ratio),
        ],
        axis=-1,
    )  # [B, H, W, 2]

    for scale in range(cfg.num_scales):
        reproj = jnp.concatenate(
            [
                reprojection_loss(
                    outputs[("color", -1, scale)], target, cfg.ssim_ratio
                ),
                reprojection_loss(
                    outputs[("color", 1, scale)], target, cfg.ssim_ratio
                ),
            ],
            axis=-1,
        )  # [B, H, W, 2]

        if cfg.auto_mask:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, identity.shape) * 1e-5
            combined = jnp.concatenate([identity + noise, reproj], axis=-1)
            to_optimise = jnp.min(combined, axis=-1, keepdims=True)
            idxs = jnp.argmin(combined, axis=-1, keepdims=True)
            outputs[f"identity_selection/{scale}"] = (
                idxs >= identity.shape[-1]
            ).astype(jnp.float32)
        else:
            to_optimise = jnp.min(reproj, axis=-1, keepdims=True)

        if cfg.uncertainty:
            # D3VO Eq.5 applied to the auto-masked min-reprojection term:
            # r/sigma + log(sigma), full-res sigma shared across scales
            # (the head emits scale 0 only; every reprojection map here is
            # already full-res). +0.01 floors the sigmoid so a saturated
            # sigma cannot blow up the quotient; at the optimum
            # sigma ~= r, so clean pixels settle near the floor and
            # violated pixels grow sigma instead of dragging the pose.
            sigma = outputs[("unc", 0)] + 0.01
            loss = jnp.mean(to_optimise / sigma) + jnp.mean(jnp.log(sigma))
        else:
            loss = jnp.mean(to_optimise)
        smooth = normalized_smooth_loss(outputs[("disp_up", scale)], target)
        loss = loss + cfg.smoothness_ratio * smooth / (2**scale)

        total_loss = total_loss + loss
        losses[f"loss/{scale}"] = loss

    total_loss = total_loss / cfg.num_scales
    losses["loss"] = total_loss
    return losses


def process_stereo_batch(
    depth_apply,
    depth_vars,
    batch: Dict[str, jnp.ndarray],
    cfg: VOLossConfig,
    rng: jax.Array,
    train: bool = False,
) -> Tuple[Dict[Any, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Stereo-pair depth supervision at a KNOWN baseline pose.

    The reference assembles stereo loaders (``vo/dataset/vo_loader.py:76-107``)
    but its training loop never consumes them (only counts them,
    ``vo/train.py:222``); here the stereo stream actually trains: the target
    view is reconstructed from the source via the calibrated pose — no
    PoseNet — which anchors metric depth scale monodepth2-style.

    Batch keys (``data/handlers.py StereoSnippetDataset``): ``source_image``,
    ``target_image``, ``intrinsic`` [B,4,4], ``pose`` [B,4,4] = the transform
    mapping TARGET-frame points into the SOURCE camera (same convention as
    the mono ``("cam_T_cam", 0, f)`` outputs).
    """
    target = batch["target_image"]
    source = batch["source_image"]
    B, H, W, _ = target.shape
    K = batch["intrinsic"]
    inv_K = jnp.linalg.inv(K)
    T = batch["pose"]

    outputs = dict(depth_apply(depth_vars, target, train))
    losses: Dict[str, jnp.ndarray] = {}
    total_loss = 0.0

    identity = reprojection_loss(source, target, cfg.ssim_ratio)  # [B,H,W,1]

    for scale in range(cfg.num_scales):
        disp_up = resize_bilinear(outputs[("disp", scale)], H, W)
        outputs[("disp_up", scale)] = disp_up
        _, depth = disp_to_depth(disp_up, cfg.min_depth, cfg.max_depth)
        outputs[("depth", scale)] = depth

        cam_points = backproject(depth, inv_K)
        grid = project(cam_points, K, T)
        color = grid_sample(source, grid, align_corners=True,
                            padding_mode="border")
        outputs[("color", "s", scale)] = color
        reproj = reprojection_loss(color, target, cfg.ssim_ratio)

        if cfg.auto_mask:
            rng, sub = jax.random.split(rng)
            noise = jax.random.normal(sub, identity.shape) * 1e-5
            combined = jnp.concatenate([identity + noise, reproj], axis=-1)
            to_optimise = jnp.min(combined, axis=-1, keepdims=True)
        else:
            to_optimise = reproj

        loss = jnp.mean(to_optimise)
        smooth = normalized_smooth_loss(disp_up, target)
        loss = loss + cfg.smoothness_ratio * smooth / (2**scale)
        total_loss = total_loss + loss
        losses[f"stereo_loss/{scale}"] = loss

    losses["loss"] = total_loss / cfg.num_scales
    return outputs, losses


def process_batch(
    depth_apply,
    pose_apply,
    depth_vars,
    pose_vars,
    batch: Dict[str, jnp.ndarray],
    cfg: VOLossConfig,
    rng: jax.Array,
    train: bool = False,
) -> Tuple[Dict[Any, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Full VO forward + loss (reference ``vo/learner_new.py:76-105``).

    ``depth_apply(vars, image, train) -> {("disp", s): ...}``;
    ``pose_apply(vars, pair, train) -> (axisangle, translation)``.
    """
    outputs = dict(depth_apply(depth_vars, batch["target_image"], train))
    outputs.update(predict_poses(pose_apply, pose_vars, batch, train))
    generate_images_pred(batch, outputs, cfg)
    losses = compute_losses(batch, outputs, cfg, rng)
    return outputs, losses
