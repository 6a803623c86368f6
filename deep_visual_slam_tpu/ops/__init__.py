"""Differentiable geometry and photometric ops (pure jnp, NHWC)."""

from deep_visual_slam_tpu.ops.se3 import (
    rotation_from_axisangle,
    axisangle_from_rotation,
    transformation_from_parameters,
    translation_matrix,
    invert_se3,
    se3_exp,
    se3_log,
)
from deep_visual_slam_tpu.ops.depth import (
    disp_to_depth,
    depth_to_disp,
    compute_depth_errors,
    silog_loss,
)
from deep_visual_slam_tpu.ops.camera import (
    pixel_grid,
    backproject,
    project,
    intrinsics_pyramid,
    scale_intrinsics,
    make_intrinsics,
)
from deep_visual_slam_tpu.ops.warp import (
    grid_sample,
    resize_bilinear,
    resize_bilinear_align_corners,
    upsample_nearest_2x,
)
from deep_visual_slam_tpu.ops.photometric import (
    ssim,
    reprojection_loss,
    smooth_loss,
)

__all__ = [
    "rotation_from_axisangle",
    "axisangle_from_rotation",
    "transformation_from_parameters",
    "translation_matrix",
    "invert_se3",
    "se3_exp",
    "se3_log",
    "disp_to_depth",
    "depth_to_disp",
    "compute_depth_errors",
    "silog_loss",
    "pixel_grid",
    "backproject",
    "project",
    "intrinsics_pyramid",
    "scale_intrinsics",
    "make_intrinsics",
    "grid_sample",
    "resize_bilinear",
    "resize_bilinear_align_corners",
    "upsample_nearest_2x",
    "ssim",
    "reprojection_loss",
    "smooth_loss",
]
