"""Pinhole camera ops in NHWC (TPU-native layout).

Parity targets (semantics, not layout):
  - BackprojectDepth: reference ``vo/learner_func.py:106-135``
  - Project3D:        reference ``vo/learner_func.py:137-159``
  - per-scale K pyramid built by the dataset: reference
    ``vo/dataset/common.py:65-75``

The reference flattens to [B, 3, H*W] matmuls; here we keep [B, H, W, ...]
maps and express the same math as fused elementwise FMA (XLA maps it onto the
VPU; the 3x3 contraction is tiny and fuses with neighbors, so no MXU round
trip through a reshaped GEMM is needed).
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp


def pixel_grid(height: int, width: int, dtype=jnp.float32) -> jnp.ndarray:
    """[H, W, 2] grid of (x, y) pixel coordinates (x = column index)."""
    xs = jnp.arange(width, dtype=dtype)
    ys = jnp.arange(height, dtype=dtype)
    x, y = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.stack([x, y], axis=-1)


def backproject(depth: jnp.ndarray, inv_K: jnp.ndarray) -> jnp.ndarray:
    """Depth map -> camera-frame 3D points.

    Args:
      depth: [B, H, W] or [B, H, W, 1].
      inv_K: [B, 4, 4] (only the top-left 3x3 is used, like the reference's
        ``inv_K[:, :3, :3] @ pix`` at ``vo/learner_func.py:131``).

    Returns:
      [B, H, W, 3] points: ``depth * K^-1 [x, y, 1]``.
    """
    if depth.ndim == 4:
        depth = depth[..., 0]
    B, H, W = depth.shape
    grid = pixel_grid(H, W, dtype=jnp.float32)  # [H, W, 2]
    x, y = grid[..., 0], grid[..., 1]
    k = inv_K.astype(jnp.float32)
    # ray = inv_K[:3,:3] @ [x, y, 1]; expanded per-row to avoid a [3,HW] GEMM.
    def row(i):
        return (
            k[:, i, 0][:, None, None] * x
            + k[:, i, 1][:, None, None] * y
            + k[:, i, 2][:, None, None]
        )

    rays = jnp.stack([row(0), row(1), row(2)], axis=-1)  # [B, H, W, 3]
    return depth.astype(jnp.float32)[..., None] * rays


def project(
    points: jnp.ndarray,
    K: jnp.ndarray,
    T: jnp.ndarray,
    height: int | None = None,
    width: int | None = None,
    eps: float = 1e-7,
) -> jnp.ndarray:
    """Project camera-frame points through rigid transform T and intrinsics K.

    Args:
      points: [B, H, W, 3] 3D points in the source camera frame.
      K: [B, 4, 4] intrinsics.
      T: [B, 4, 4] camera-to-camera transform.
      height/width: normalization extent (defaults to the point-map shape).

    Returns:
      [B, H, W, 2] sampling coordinates normalized to [-1, 1] with the
      reference's align_corners=True convention
      (``vo/learner_func.py:153-159``: divide by (W-1)/(H-1), then
      ``(c - 0.5) * 2``).
    """
    B, H, W, _ = points.shape
    height = H if height is None else height
    width = W if width is None else width
    P = (K.astype(jnp.float32) @ T.astype(jnp.float32))[:, :3, :]  # [B, 3, 4]
    pts = points.astype(jnp.float32)

    def row(i):
        return (
            P[:, i, 0][:, None, None] * pts[..., 0]
            + P[:, i, 1][:, None, None] * pts[..., 1]
            + P[:, i, 2][:, None, None] * pts[..., 2]
            + P[:, i, 3][:, None, None]
        )

    px, py, pz = row(0), row(1), row(2)
    inv_z = 1.0 / (pz + eps)
    u = px * inv_z
    v = py * inv_z
    u = (u / (width - 1) - 0.5) * 2.0
    v = (v / (height - 1) - 0.5) * 2.0
    return jnp.stack([u, v], axis=-1)


def scale_intrinsics(K: jnp.ndarray, scale_x: float, scale_y: float) -> jnp.ndarray:
    """Scale a 4x4 intrinsic matrix for a resized image.

    Matches the dataset convention of scaling fx/cx by width ratio and fy/cy
    by height ratio (reference ``vo/dataset/common.py:65-75``).
    """
    K = K.astype(jnp.float32)
    K = K.at[..., 0, :].multiply(scale_x)
    return K.at[..., 1, :].multiply(scale_y)


def intrinsics_pyramid(
    K: jnp.ndarray, num_scales: int
) -> List[Tuple[jnp.ndarray, jnp.ndarray]]:
    """Per-scale (K, inv_K) pairs, scale s = K / 2**s on the pixel rows.

    Reference builds this on the host per sample
    (``vo/dataset/common.py:65-75``); here it is a device op so one K serves
    all scales.
    """
    out = []
    for s in range(num_scales):
        Ks = scale_intrinsics(K, 1.0 / (2**s), 1.0 / (2**s))
        out.append((Ks, jnp.linalg.inv(Ks)))
    return out


def make_intrinsics(fx: float, fy: float, cx: float, cy: float) -> jnp.ndarray:
    """Build a 4x4 homogeneous intrinsic matrix."""
    K = jnp.eye(4, dtype=jnp.float32)
    K = K.at[0, 0].set(fx)
    K = K.at[1, 1].set(fy)
    K = K.at[0, 2].set(cx)
    return K.at[1, 2].set(cy)
