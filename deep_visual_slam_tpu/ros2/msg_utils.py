"""ROS2 message construction helpers, usable (and tested) without rclpy.

Parity target: reference ``ros2_ws/src/vo_visualizer/vo_visualizer/
visualizer_node.py:114-195`` — PointCloud2 packing with RGB packed into a
float field, and rotation-matrix -> quaternion conversion for the TF
transform.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def pack_rgb_float(colors: np.ndarray) -> np.ndarray:
    """[N, 3] float colors in [0,1] -> [N] float32 with RGB bit-packed.

    The standard PointCloud2 'rgb' float field: uint32 0x00RRGGBB
    reinterpreted as float32 (reference ``visualizer_node.py:131-142``).
    """
    c = np.clip(colors, 0.0, 1.0)
    r = (c[:, 0] * 255).astype(np.uint32)
    g = (c[:, 1] * 255).astype(np.uint32)
    b = (c[:, 2] * 255).astype(np.uint32)
    rgb = (r << 16) | (g << 8) | b
    return rgb.view(np.float32)


def pointcloud2_data(points: np.ndarray, colors: np.ndarray) -> Tuple[bytes, int]:
    """Serialize xyz+rgb points to PointCloud2 byte payload.

    Returns (data, point_step). Field layout: x, y, z, rgb — 4 float32s.
    """
    n = len(points)
    buf = np.empty((n, 4), np.float32)
    buf[:, :3] = points.astype(np.float32)
    buf[:, 3] = pack_rgb_float(colors)
    return buf.tobytes(), 16


def rotation_matrix_to_quaternion(R: np.ndarray) -> np.ndarray:
    """[3, 3] rotation -> (x, y, z, w) quaternion (Shepperd's method)."""
    t = np.trace(R)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        w = 0.25 * s
        x = (R[2, 1] - R[1, 2]) / s
        y = (R[0, 2] - R[2, 0]) / s
        z = (R[1, 0] - R[0, 1]) / s
    elif R[0, 0] > R[1, 1] and R[0, 0] > R[2, 2]:
        s = np.sqrt(1.0 + R[0, 0] - R[1, 1] - R[2, 2]) * 2
        w = (R[2, 1] - R[1, 2]) / s
        x = 0.25 * s
        y = (R[0, 1] + R[1, 0]) / s
        z = (R[0, 2] + R[2, 0]) / s
    elif R[1, 1] > R[2, 2]:
        s = np.sqrt(1.0 + R[1, 1] - R[0, 0] - R[2, 2]) * 2
        w = (R[0, 2] - R[2, 0]) / s
        x = (R[0, 1] + R[1, 0]) / s
        y = 0.25 * s
        z = (R[1, 2] + R[2, 1]) / s
    else:
        s = np.sqrt(1.0 + R[2, 2] - R[0, 0] - R[1, 1]) * 2
        w = (R[1, 0] - R[0, 1]) / s
        x = (R[0, 2] + R[2, 0]) / s
        y = (R[1, 2] + R[2, 1]) / s
        z = 0.25 * s
    return np.array([x, y, z, w])
