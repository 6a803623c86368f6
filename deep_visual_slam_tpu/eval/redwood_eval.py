"""Offline Redwood trajectory evaluation harness.

Parity target: reference ``vo/eval_redwood.py`` (``RedwoodEvaluator``):
  - per consecutive frame pair: PoseNet forward (invert=True, ``:346-348``),
  - GT relative poses ``inv(T1) @ T2`` from the PoseGraph (``:59-73``),
  - per-pair pos/rot error CSV rows (``:593-612``),
  - optional median-translation-ratio scale correction (``:439-490``),
  - Umeyama-aligned ATE + trajectory plots (3D/top/side/front, ``:360-437``),
  - test scenes: apartment, bedroom, boardroom, lobby, loft (``:656``).

TPU-native: frame pairs are batched through one jitted PoseNet forward
instead of the reference's per-pair Python loop.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from deep_visual_slam_tpu.data.base import read_image_rgb
from deep_visual_slam_tpu.data.redwood import (
    TEST_SCENES,
    load_intrinsic,
    load_posegraph_json,
)
from deep_visual_slam_tpu.eval.trajectory import (
    accumulate_trajectory,
    ate_rmse,
    kitti_segment_errors,
    pose_error,
    relative_pose,
    rpe,
    scale_correction_factor,
)
from deep_visual_slam_tpu.ops import transformation_from_parameters


def make_pose_fn(
    pose_model, variables, invert: bool = True, batch_size: int = 16
) -> Callable[[np.ndarray], np.ndarray]:
    """Build a batched pair -> relative-pose predictor.

    Matches the reference's eval-time convention of predicting with
    invert=True over (frame_t, frame_t+1) pairs (``vo/eval_redwood.py:325-350``).
    """

    @jax.jit
    def _fwd(pairs):
        aa, t = pose_model.apply(variables, pairs, train=False)
        return transformation_from_parameters(
            aa[:, 0, 0], t[:, 0, 0], invert=invert
        )

    def predict(pairs_np: np.ndarray) -> np.ndarray:
        out = []
        n = pairs_np.shape[0]
        for i in range(0, n, batch_size):
            chunk = pairs_np[i : i + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad:  # static batch shape for one compiled program
                chunk = np.concatenate([chunk, np.zeros_like(chunk[:pad])], 0)
            T = np.asarray(_fwd(jnp.asarray(chunk)))
            out.append(T[: batch_size - pad] if pad else T)
        return np.concatenate(out, axis=0)

    return predict


class RedwoodEvaluator:
    """Full offline eval over Redwood test scenes."""

    def __init__(
        self,
        pose_fn: Callable[[np.ndarray], np.ndarray],
        root_dir: str,
        image_size=(480, 640),
        fold: str = "test",
    ):
        self.pose_fn = pose_fn
        self.root_dir = root_dir
        self.image_size = image_size
        self.fold = fold

    def _scene_frames(self, scene: str):
        import glob

        scene_dir = os.path.join(self.root_dir, self.fold, scene)
        images = sorted(glob.glob(os.path.join(scene_dir, "image", "*.jpg")))
        poses = load_posegraph_json(os.path.join(scene_dir, f"{scene}.json"))
        n = min(len(images), len(poses))
        return images[:n], np.asarray(poses[:n])

    def predict_scene_relatives(self, image_files: Sequence[str]) -> np.ndarray:
        """Predicted rel pose per consecutive pair, batched on device."""
        H, W = self.image_size
        frames = [read_image_rgb(p, H, W) for p in image_files]
        pairs = np.stack(
            [
                np.concatenate([frames[i], frames[i + 1]], axis=-1)
                for i in range(len(frames) - 1)
            ]
        )
        return self.pose_fn(pairs)

    def evaluate_scene(
        self,
        scene: str,
        output_dir: Optional[str] = None,
        use_scale_correction: bool = True,
    ) -> Dict:
        image_files, poses_gt = self._scene_frames(scene)
        rel_pred = self.predict_scene_relatives(image_files)
        rel_gt = np.stack(
            [
                relative_pose(poses_gt[i], poses_gt[i + 1])
                for i in range(len(poses_gt) - 1)
            ]
        )

        scale = 1.0
        if use_scale_correction:
            scale = scale_correction_factor(rel_gt, rel_pred)
            rel_pred = rel_pred.copy()
            rel_pred[:, :3, 3] *= scale

        # Per-pair errors (CSV rows, reference :593-612).
        rows = []
        for i, (g, p) in enumerate(zip(rel_gt, rel_pred)):
            pos_e, rot_e, pos_d, rot_d = pose_error(g, p)
            rows.append(
                {
                    "pair": i,
                    "pos_error_m": pos_e,
                    "rot_error_deg": rot_e,
                    "dx": pos_d[0],
                    "dy": pos_d[1],
                    "dz": pos_d[2],
                    "droll": rot_d[0],
                    "dpitch": rot_d[1],
                    "dyaw": rot_d[2],
                }
            )

        traj_pred = accumulate_trajectory(rel_pred, poses_gt[0])
        _, aligned, ate_stats = ate_rmse(traj_pred, poses_gt, align=True)
        # Side-by-side bug-compat number: the reference's unnormalized
        # Umeyama scale (vo/eval_redwood.py:124-126).
        ref_ate, _, _ = ate_rmse(
            traj_pred, poses_gt, align=True, reference_scale_bug=True
        )
        rpe_stats = {
            k: v for k, v in rpe(traj_pred, poses_gt).items()
            if not isinstance(v, np.ndarray)
        }
        _, t_rel, r_rel = kitti_segment_errors(traj_pred, poses_gt)

        result = {
            "scene": scene,
            "num_pairs": len(rows),
            "scale_factor": scale,
            **ate_stats,
            "ate_rmse_reference_umeyama": ref_ate,
            **rpe_stats,
            "kitti_t_rel_pct": t_rel * 100.0,
            "kitti_r_rel_deg_per_100m": np.degrees(r_rel) * 100.0,
        }

        if output_dir is not None:
            os.makedirs(output_dir, exist_ok=True)
            import pandas as pd

            pd.DataFrame(rows).to_csv(
                os.path.join(output_dir, f"{scene}_pairs.csv"), index=False
            )
            self._plot_scene(
                scene, aligned, poses_gt,
                os.path.join(output_dir, f"{scene}_trajectory.png"),
            )
            # KITTI-style 2D path + speed heatmap panels per scene
            # (reference wires these from plot_results,
            # vo/utils/utils.py:319-415).
            from deep_visual_slam_tpu.eval.trajectory import plot_path_heatmaps

            plot_path_heatmaps(scene, poses_gt, aligned, output_dir)
        return result

    def evaluate(
        self,
        scenes: Sequence[str] = TEST_SCENES,
        output_dir: Optional[str] = None,
        use_scale_correction: bool = True,
    ) -> List[Dict]:
        results = []
        for scene in scenes:
            scene_dir = os.path.join(self.root_dir, self.fold, scene)
            if not os.path.isdir(scene_dir):
                print(f"Warning: scene '{scene}' not found, skipping")
                continue
            results.append(
                self.evaluate_scene(scene, output_dir, use_scale_correction)
            )
        return results

    @staticmethod
    def _plot_scene(scene, traj_pred, traj_gt, out_path):
        """4-view trajectory figure (3D + top/side/front, reference :360-437)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        p = traj_pred[:, :3, 3]
        g = traj_gt[:, :3, 3]
        fig = plt.figure(figsize=(12, 10))
        ax = fig.add_subplot(221, projection="3d")
        ax.plot(*p.T, "b-", label="pred")
        ax.plot(*g.T, "r--", label="gt")
        ax.set_title(f"{scene} 3D")
        ax.legend()
        for idx, (i, j, name) in enumerate(
            [(0, 2, "top (x-z)"), (0, 1, "front (x-y)"), (2, 1, "side (z-y)")]
        ):
            ax2 = fig.add_subplot(222 + idx)
            ax2.plot(p[:, i], p[:, j], "b-")
            ax2.plot(g[:, i], g[:, j], "r--")
            ax2.set_title(name)
            ax2.axis("equal")
        fig.savefig(out_path, dpi=100)
        plt.close(fig)
