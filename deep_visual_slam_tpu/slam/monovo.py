"""MonoVO: the per-frame SLAM pipeline (networks + frontend + backend).

Parity target: reference ``slam/MonoVO.py`` — per frame: DepthNet inference,
PoseNet inference vs the previous frame, frontend keypoint tracking, and
windowed backend optimization when a keyframe is added.

``Networks`` replaces the reference's stale TF wrapper (``slam/network.py``,
which imports modules absent from the tree, SURVEY.md §2.7) with jitted Flax
inference on the framework's own DepthNet/PoseNet.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_visual_slam_tpu.models import DepthNet, PoseNet
from deep_visual_slam_tpu.ops import disp_to_depth, transformation_from_parameters
from deep_visual_slam_tpu.slam.frontend import Frame, Point, match_frame_kps
from deep_visual_slam_tpu.slam.map import Map


class Networks:
    """Jitted DepthNet + PoseNet inference for the SLAM loop."""

    def __init__(
        self,
        depth_variables=None,
        pose_variables=None,
        image_shape: Tuple[int, int] = (480, 640),
        min_depth: float = 0.1,
        max_depth: float = 10.0,
        dtype=jnp.bfloat16,
        seed: int = 0,
    ):
        H, W = image_shape
        self.image_shape = image_shape
        self.depth_model = DepthNet(dtype=dtype)
        self.pose_model = PoseNet(dtype=dtype)
        key = jax.random.PRNGKey(seed)
        if depth_variables is None:
            depth_variables = jax.jit(self.depth_model.init)(
                key, jnp.zeros((1, H, W, 3), jnp.float32)
            )
        if pose_variables is None:
            pose_variables = jax.jit(self.pose_model.init)(
                key, jnp.zeros((1, H, W, 6), jnp.float32)
            )
        self._dv = depth_variables
        self._pv = pose_variables
        self.min_depth = min_depth
        self.max_depth = max_depth

        @jax.jit
        def _depth(img):
            disps = self.depth_model.apply(self._dv, img, train=False)
            _, depth = disp_to_depth(
                disps[("disp", 0)], self.min_depth, self.max_depth
            )
            return depth[..., 0]

        @jax.jit
        def _pose(img1, img2):
            pair = jnp.concatenate([img1, img2], axis=-1)
            aa, t = self.pose_model.apply(self._pv, pair, train=False)
            return transformation_from_parameters(aa[:, 0, 0], t[:, 0, 0])

        self._depth_fn = _depth
        self._pose_fn = _pose

    def depth(self, image: np.ndarray) -> np.ndarray:
        """[H, W, 3] float image -> [H, W] metric depth."""
        out = self._depth_fn(jnp.asarray(image, jnp.float32)[None])
        return np.asarray(out[0])

    def pose(self, image1: np.ndarray, image2: np.ndarray) -> np.ndarray:
        """Relative transform prev->cur as a 4x4 (prev frame 1, cur frame 2)."""
        T = self._pose_fn(
            jnp.asarray(image1, jnp.float32)[None],
            jnp.asarray(image2, jnp.float32)[None],
        )
        return np.asarray(T[0], np.float64)


class MonoVO:
    """Full monocular SLAM loop (reference ``slam/MonoVO.py:15-72``)."""

    def __init__(
        self,
        intrinsic: np.ndarray,
        networks: Optional[Networks] = None,
        image_shape: Tuple[int, int] = (480, 640),
        num_kf: int = 7,
        max_points: int = 256,
    ):
        self.intrinsic = np.asarray(intrinsic)
        self.mp = Map(num_kf=num_kf, max_points=max_points)
        self.nn = networks or Networks(image_shape=image_shape)

    def process_frame(self, frame: np.ndarray, optimize: bool = True):
        """Run one RGB frame ([H, W, 3] float [0,1]) through the pipeline."""
        depth = self.nn.depth(frame)
        uncertainty = np.zeros_like(depth)

        if len(self.mp.frames) == 0:
            pose_global = np.eye(4)
            a, b = 1.0, 0.0
        else:
            rel = self.nn.pose(self.mp.frames[-1].image, frame)
            # Frame pose is GLOBAL T_cw: compose the relative net pose onto
            # the previous frame's global pose.
            pose_global = rel @ self.mp.frames[-1].pose
            a, b = 1.0, 0.0

        if not self.frontend(frame, depth, uncertainty, pose_global, (a, b)):
            return depth, uncertainty, self.mp.frames[-1].pose, a, b

        if optimize:
            self.mp.optimize(self.intrinsic)
        return depth, uncertainty, self.mp.frames[-1].pose, a, b

    def frontend(self, frame, depth, uncertainty, pose, brightness_params) -> bool:
        """Track keypoints vs the previous frame; returns True when a new
        keyframe was added (=> run backend)."""
        f = Frame(self.mp, frame, depth, uncertainty, pose, brightness_params)

        if f.id == 0:
            self.mp.check_add_key_frame(f)
            return False

        prev_f = self.mp.frames[-2]
        l1, l2 = match_frame_kps(f, prev_f)
        for idx1, idx2 in zip(l1, l2):
            if idx1 in f.pts:
                continue
            if idx2 in prev_f.pts:
                pt = prev_f.pts[idx2]
                if pt.valid and f not in pt.frames:
                    pt.add_observation(f, idx1)
            else:
                pt = Point(self.mp)
                pt.add_observation(f, idx1)
                pt.add_observation(prev_f, idx2)

        return self.mp.check_add_key_frame(f)

    def trajectory(self) -> np.ndarray:
        """Global camera-to-world poses of all frames ([N, 4, 4])."""
        return np.stack([np.linalg.inv(f.pose) for f in self.mp.frames])
