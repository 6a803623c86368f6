"""Redwood RGB-D scene dataset (VO snippets + GT trajectories).

Parity target: reference ``vo/dataset/redwood.py``:
  - scene layout ``<root>/<fold>/<scene>/image/*.jpg`` +
    ``<root>/<fold>/<scene>/<scene>.json`` (Open3D PoseGraph),
  - PoseGraph node poses are **column-major** flattened 4x4 camera-to-world
    matrices (``vo/dataset/redwood.py:45-64``),
  - intrinsics from ``<root>/intrinsic.npy`` (3x3), rescaled from the native
    640x480 to the configured size and lifted to 4x4 (``:163-184``),
  - folds: train / validation / test; unloadable scenes are skipped with a
    warning (``:209-225``),
  - eval mode attaches GT relative poses ``inv(T1) @ T2`` (``:93-137``).
"""

from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from deep_visual_slam_tpu.data.base import SnippetDataset

REDWOOD_NATIVE_SIZE = (480, 640)  # (H, W)
# fx=fy=525, cx=319.5, cy=239.5 (reference README.md:135-138)
REDWOOD_DEFAULT_K3 = np.array(
    [[525.0, 0.0, 319.5], [0.0, 525.0, 239.5], [0.0, 0.0, 1.0]], np.float32
)
TEST_SCENES = ("apartment", "bedroom", "boardroom", "lobby", "loft")


def load_posegraph_json(json_path: str) -> List[np.ndarray]:
    """Open3D PoseGraph JSON -> list of 4x4 camera-to-world poses.

    The 16 values per node are column-major (Fortran) order — reshaping with
    order="F" puts the translation in the last column
    (reference ``vo/dataset/redwood.py:45-64``).
    """
    with open(json_path) as f:
        data = json.load(f)
    poses = []
    for node in data.get("nodes", []):
        poses.append(
            np.asarray(node["pose"], np.float32).reshape(4, 4, order="F")
        )
    return poses


def load_intrinsic(
    root_dir: str, image_size: Tuple[int, int]
) -> np.ndarray:
    """``intrinsic.npy`` (3x3) -> 4x4 scaled to ``image_size`` (H, W).

    Falls back to the published Redwood camera if the file is absent.
    """
    path = os.path.join(root_dir, "intrinsic.npy")
    K3 = np.load(path) if os.path.exists(path) else REDWOOD_DEFAULT_K3
    H0, W0 = REDWOOD_NATIVE_SIZE
    H, W = image_size
    K4 = np.eye(4, dtype=np.float32)
    K4[0, 0] = K3[0, 0] * W / W0
    K4[1, 1] = K3[1, 1] * H / H0
    K4[0, 2] = K3[0, 2] * W / W0
    K4[1, 2] = K3[1, 2] * H / H0
    return K4


def load_scene(
    scene_dir: str,
    scene_name: str,
    intrinsic: np.ndarray,
    image_size: Tuple[int, int],
    is_train: bool,
    augment: bool,
) -> SnippetDataset:
    """One scene -> SnippetDataset (images truncated to pose count)."""
    image_files = sorted(glob.glob(os.path.join(scene_dir, "image", "*.jpg")))
    poses = load_posegraph_json(
        os.path.join(scene_dir, f"{scene_name}.json")
    )
    n = min(len(image_files), len(poses))
    if n == 0:
        raise ValueError(f"scene {scene_name}: no frames/poses")
    return SnippetDataset(
        rgb_paths=image_files[:n],
        intrinsic=intrinsic,
        image_size=image_size,
        is_train=is_train,
        augment=augment,
        poses=poses[:n],
    )


class RedwoodDataset:
    """All scenes of one fold, concatenated (reference ``:186-230``)."""

    def __init__(
        self,
        root_dir: str,
        fold: str,
        image_size: Tuple[int, int],
        is_train: bool = True,
        augment: bool = True,
    ):
        self.scenes: List[SnippetDataset] = []
        self.scene_names: List[str] = []
        fold_dir = os.path.join(root_dir, fold)
        if not os.path.isdir(fold_dir):
            return
        intrinsic = load_intrinsic(root_dir, image_size)
        for scene in sorted(os.listdir(fold_dir)):
            scene_dir = os.path.join(fold_dir, scene)
            if not os.path.isdir(scene_dir):
                continue
            try:
                ds = load_scene(
                    scene_dir, scene, intrinsic, image_size, is_train, augment
                )
            except Exception as e:  # skip unloadable scenes (reference :209-225)
                print(f"Warning: skipping Redwood scene '{scene}': {e}")
                continue
            if len(ds) > 0:
                self.scenes.append(ds)
                self.scene_names.append(scene)
        self._offsets = np.cumsum([0] + [len(s) for s in self.scenes])

    def __len__(self) -> int:
        return int(self._offsets[-1]) if len(self.scenes) else 0

    def __getitem__(self, idx: int, rng=None) -> Dict:
        scene_i = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.scenes[scene_i].__getitem__(
            idx - int(self._offsets[scene_i]), rng
        )


class RedwoodDataHandler:
    """Config-gated fold assembly (reference ``vo/dataset/redwood.py:243-285``)."""

    def __init__(self, config: Dict, root_dir: Optional[str] = None):
        t = config["Train"]
        image_size = (t["img_h"], t["img_w"])
        self.root_dir = root_dir or os.path.join(
            config["Directory"]["data_dir"], "redwood"
        )
        enabled = config["Dataset"].get("redwood", {}).get("mono", False)
        self.train_dataset = None
        self.valid_dataset = None
        self.test_dataset = None
        if not enabled:
            return
        self.train_dataset = RedwoodDataset(
            self.root_dir, "train", image_size, is_train=True, augment=True
        )
        self.valid_dataset = RedwoodDataset(
            self.root_dir, "validation", image_size, is_train=False, augment=False
        )
        self.test_dataset = RedwoodDataset(
            self.root_dir, "test", image_size, is_train=False, augment=False
        )
