"""Evaluation harnesses: trajectory + depth metrics."""

from deep_visual_slam_tpu.eval.trajectory import (
    accumulate_trajectory,
    ate_rmse,
    kitti_segment_errors,
    pose_error,
    relative_pose,
    rotation_angle_deg,
    rotation_matrix_to_euler,
    rpe,
    scale_correction_factor,
    umeyama_alignment,
)
from deep_visual_slam_tpu.eval.metrics import DepthMetrics
from deep_visual_slam_tpu.eval.traj_eval import EvalTrajectory
from deep_visual_slam_tpu.eval.redwood_eval import RedwoodEvaluator, make_pose_fn

__all__ = [
    "accumulate_trajectory",
    "ate_rmse",
    "kitti_segment_errors",
    "pose_error",
    "relative_pose",
    "rotation_angle_deg",
    "rotation_matrix_to_euler",
    "rpe",
    "scale_correction_factor",
    "umeyama_alignment",
    "DepthMetrics",
    "EvalTrajectory",
    "RedwoodEvaluator",
    "make_pose_fn",
]
