"""Additional dataset sources: MarsLogger, custom capture rig, IRS, stereo.

Parity targets:
  - MarsLogger (phone capture): mp4 -> frame extraction with 90° CCW rotate +
    resize, intrinsics from calibration npy rescaled and lifted to 4x4
    (reference ``vo/dataset/mars_logger.py:61-100``).
  - Custom rig (tspxr_capture): scenes of ``rgb_left`` frames + sensor calib
    npy (reference ``vo/dataset/custom_data.py:16-100``).
  - IRS synthetic stereo: fixed fx=fy=480, cx=480, cy=270 at 540x960
    (reference ``vo/dataset/irs.py:46-54``).
  - StereoSnippetDataset: image pair + known-baseline pose + intrinsics with
    softer jitter (reference ``vo/dataset/common.py:94-153``).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from deep_visual_slam_tpu.data.base import (
    SnippetDataset,
    color_jitter,
    read_image_rgb,
)


def rescale_intrinsic_4x4(
    K3: np.ndarray, target_size: Tuple[int, int], current_size: Tuple[int, int]
) -> np.ndarray:
    """3x3 intrinsics -> 4x4 scaled from current (H, W) to target (H, W)."""
    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0] = K3[0, 0] * target_size[1] / current_size[1]
    K4[1, 1] = K3[1, 1] * target_size[0] / current_size[0]
    K4[0, 2] = K3[0, 2] * target_size[1] / current_size[1]
    K4[1, 2] = K3[1, 2] * target_size[0] / current_size[0]
    return K4


def extract_video_frames(
    video_file: str,
    out_dir: str,
    image_size: Tuple[int, int],
    rotate_ccw: bool = True,
) -> List[str]:
    """One-time mp4 -> jpg extraction (reference ``mars_logger.py:61-90``)."""
    if not os.path.isdir(out_dir) or not os.listdir(out_dir):
        os.makedirs(out_dir, exist_ok=True)
        cap = cv2.VideoCapture(video_file)
        if not cap.isOpened():
            raise ValueError(f"Failed to open video file: {video_file}")
        idx = 0
        H, W = image_size
        while True:
            ret, frame = cap.read()
            if not ret:
                break
            if rotate_ccw:
                frame = cv2.rotate(frame, cv2.ROTATE_90_COUNTERCLOCKWISE)
            frame = cv2.resize(frame, (W, H))
            cv2.imwrite(os.path.join(out_dir, f"rgb_{idx:06d}.jpg"), frame)
            idx += 1
        cap.release()
    return sorted(glob.glob(os.path.join(out_dir, "*.jpg")))


class MarsLoggerDataset(SnippetDataset):
    """One MarsLogger scene: extracted video frames + calibrated intrinsics.

    Scene layout: ``<scene>/movie.mp4`` (+ extracted ``rgb/``); calibration
    at ``<root>/<camera>/calibration_results/{calibration_results.json,
    camera_matrix.npy}``.
    """

    def __init__(
        self,
        scene_dir: str,
        calib_dir: str,
        image_size: Tuple[int, int],
        is_train: bool = True,
        augment: bool = True,
    ):
        frames = extract_video_frames(
            os.path.join(scene_dir, "movie.mp4"),
            os.path.join(scene_dir, "rgb"),
            image_size,
        )
        with open(os.path.join(calib_dir, "calibration_results.json")) as f:
            meta = json.load(f)
        current = (meta["image_height"], meta["image_width"])
        K3 = np.load(os.path.join(calib_dir, "camera_matrix.npy"))
        # Frames were rotated 90° CCW at extraction: swap the calib axes.
        K3_rot = np.array(
            [[K3[1, 1], 0, K3[1, 2]], [0, K3[0, 0], K3[0, 2]], [0, 0, 1]],
            np.float32,
        )
        current_rot = (current[1], current[0])
        K4 = rescale_intrinsic_4x4(K3_rot, image_size, current_rot)
        super().__init__(frames, K4, image_size, is_train, augment)


class CustomRigDataset(SnippetDataset):
    """tspxr_capture rig scene: ``rgb_left/*.jpg`` (or png) + sensor calib.

    Calibration: ``<scene>/sensor/left_intrinsics.npy`` (3x3 at native
    resolution given by the first frame).
    """

    def __init__(
        self,
        scene_dir: str,
        image_size: Tuple[int, int],
        is_train: bool = True,
        augment: bool = True,
    ):
        frames = sorted(
            glob.glob(os.path.join(scene_dir, "rgb_left", "*.jpg"))
            + glob.glob(os.path.join(scene_dir, "rgb_left", "*.png"))
        )
        if not frames:
            raise ValueError(f"no rgb_left frames in {scene_dir}")
        K3 = np.load(os.path.join(scene_dir, "sensor", "left_intrinsics.npy"))
        native = cv2.imread(frames[0]).shape[:2]
        K4 = rescale_intrinsic_4x4(K3, image_size, native)
        super().__init__(frames, K4, image_size, is_train, augment)


IRS_NATIVE_SIZE = (540, 960)
IRS_K3 = np.array(
    [[480.0, 0.0, 480.0], [0.0, 480.0, 270.0], [0.0, 0.0, 1.0]], np.float32
)


class IrsDataset(SnippetDataset):
    """IRS synthetic sequence with the dataset's fixed intrinsics
    (reference ``vo/dataset/irs.py:46-54``)."""

    def __init__(
        self,
        scene_dir: str,
        image_size: Tuple[int, int],
        is_train: bool = True,
        augment: bool = True,
    ):
        frames = sorted(
            glob.glob(os.path.join(scene_dir, "l_*.png"))
            + glob.glob(os.path.join(scene_dir, "left", "*.png"))
            + glob.glob(os.path.join(scene_dir, "left", "*.jpg"))
        )
        if not frames:
            raise ValueError(f"no left frames in {scene_dir}")
        K4 = rescale_intrinsic_4x4(IRS_K3, image_size, IRS_NATIVE_SIZE)
        super().__init__(frames, K4, image_size, is_train, augment)


class StereoSnippetDataset:
    """Stereo pair samples with a known baseline pose.

    Emits {source_image, target_image, intrinsic, pose} like the reference's
    ``StereoDataset.__getitem__`` (``vo/dataset/common.py:127-153``), with
    the softer jitter (0.2/0.2/0.2/0.1).
    """

    def __init__(
        self,
        source_paths: Sequence[str],
        target_paths: Sequence[str],
        intrinsics: Sequence[np.ndarray],
        poses: Sequence[np.ndarray],
        image_size: Tuple[int, int],
        is_train: bool = True,
        augment: bool = True,
    ):
        assert len(source_paths) == len(target_paths) == len(poses)
        self.source_paths = list(source_paths)
        self.target_paths = list(target_paths)
        self.intrinsics = list(intrinsics)
        self.poses = list(poses)
        self.image_size = image_size
        self.is_train = is_train
        self.augment = augment and is_train

    def __len__(self) -> int:
        return len(self.source_paths)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None) -> Dict:
        if rng is None:
            rng = np.random.default_rng()
        H, W = self.image_size
        src = read_image_rgb(self.source_paths[idx], H, W)
        tgt = read_image_rgb(self.target_paths[idx], H, W)
        if self.augment and rng.uniform() < 0.5:
            stack = color_jitter(
                np.stack([src, tgt]), rng,
                brightness=0.2, contrast=0.2, saturation=0.2, hue=0.1,
            )
            src, tgt = stack[0], stack[1]
        return {
            "source_image": src,
            "target_image": tgt,
            "intrinsic": np.asarray(self.intrinsics[idx], np.float32),
            "pose": np.asarray(self.poses[idx], np.float32),
        }


def build_stereo_dataset(
    left_paths: Sequence[str],
    right_paths: Sequence[str],
    K4: np.ndarray,
    baseline_m: float,
    image_size: Tuple[int, int],
    is_train: bool = True,
    augment: bool = True,
) -> StereoSnippetDataset:
    """Rectified pair -> BOTH directed samples, like the reference's
    ``_create_stereo_samples`` (``vo/dataset/irs.py:183-208``): (target=left,
    source=right) and (target=right, source=left).

    Pose convention: the emitted 4x4 maps TARGET-frame points into the
    SOURCE camera (what the warp needs); with the right camera at
    +baseline along x of the left, that is t_x = -baseline for the
    left-target sample. (The reference stores a 6-vector [aa, t]; a 4x4 is
    the same information in the form the solver consumes.)
    """
    n = min(len(left_paths), len(right_paths))
    if n == 0:
        raise ValueError("no stereo pairs")
    lefts, rights = list(left_paths[:n]), list(right_paths[:n])
    T_rl = np.eye(4, dtype=np.float32)
    T_rl[0, 3] = -baseline_m  # left-frame point seen from the right camera
    T_lr = np.eye(4, dtype=np.float32)
    T_lr[0, 3] = baseline_m
    return StereoSnippetDataset(
        source_paths=rights + lefts,
        target_paths=lefts + rights,
        intrinsics=[K4] * (2 * n),
        poses=[T_rl] * n + [T_lr] * n,
        image_size=image_size,
        is_train=is_train,
        augment=augment,
    )


IRS_BASELINE_M = 0.1  # reference vo/dataset/irs.py:168


def irs_stereo_dataset(
    scene_dir: str, image_size: Tuple[int, int], is_train: bool = True
) -> StereoSnippetDataset:
    """IRS left/right pairs at the dataset's fixed 10 cm baseline."""
    lefts = sorted(
        glob.glob(os.path.join(scene_dir, "l_*.png"))
        + glob.glob(os.path.join(scene_dir, "left", "*.png"))
        + glob.glob(os.path.join(scene_dir, "left", "*.jpg"))
    )
    rights = sorted(
        glob.glob(os.path.join(scene_dir, "r_*.png"))
        + glob.glob(os.path.join(scene_dir, "right", "*.png"))
        + glob.glob(os.path.join(scene_dir, "right", "*.jpg"))
    )
    K4 = rescale_intrinsic_4x4(IRS_K3, image_size, IRS_NATIVE_SIZE)
    return build_stereo_dataset(
        lefts, rights, K4, IRS_BASELINE_M, image_size, is_train, is_train
    )


def custom_stereo_dataset(
    scene_dir: str, image_size: Tuple[int, int], is_train: bool = True
) -> StereoSnippetDataset:
    """tspxr_capture rig pairs: ``rgb_left``/``rgb_right`` + calibrated
    baseline from ``sensor/stereo_parameters.json`` (reference
    ``vo/dataset/custom_data.py:164-188``)."""
    lefts = sorted(
        glob.glob(os.path.join(scene_dir, "rgb_left", "*.jpg"))
        + glob.glob(os.path.join(scene_dir, "rgb_left", "*.png"))
    )
    rights = sorted(
        glob.glob(os.path.join(scene_dir, "rgb_right", "*.jpg"))
        + glob.glob(os.path.join(scene_dir, "rgb_right", "*.png"))
    )
    with open(os.path.join(scene_dir, "sensor", "stereo_parameters.json")) as f:
        baseline_m = float(json.load(f)["baseline_m"])
    K3 = np.load(os.path.join(scene_dir, "sensor", "left_intrinsics.npy"))
    native = cv2.imread(lefts[0]).shape[:2] if lefts else IRS_NATIVE_SIZE
    K4 = rescale_intrinsic_4x4(K3, image_size, native)
    return build_stereo_dataset(
        lefts, rights, K4, baseline_m, image_size, is_train, is_train
    )


def _scene_dirs(root: str) -> List[str]:
    if not os.path.isdir(root):
        return []
    return sorted(
        d for d in glob.glob(os.path.join(root, "*")) if os.path.isdir(d)
    )


class MarsLoggerDataHandler:
    """Fold assembly over MarsLogger scenes under ``<root>/{train,valid,test}``."""

    def __init__(self, config: Dict, root_dir: Optional[str] = None):
        t = config["Train"]
        image_size = (t["img_h"], t["img_w"])
        root = root_dir or os.path.join(
            config["Directory"]["data_dir"], "mars_logger"
        )
        self.train_dataset = None
        self.valid_dataset = None
        if not config["Dataset"].get("mars_logger", {}).get("mono", False):
            return
        from deep_visual_slam_tpu.data.loader import ConcatDataset

        calib = os.path.join(root, "calibration_results")

        def build(fold, is_train):
            sets = []
            for scene in _scene_dirs(os.path.join(root, fold)):
                try:
                    sets.append(
                        MarsLoggerDataset(scene, calib, image_size, is_train, is_train)
                    )
                except Exception as e:
                    print(f"Warning: skipping mars_logger scene {scene}: {e}")
            return ConcatDataset(sets) if sets else None

        self.train_dataset = build("train", True)
        self.valid_dataset = build("valid", False)
