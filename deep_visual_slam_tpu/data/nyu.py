"""NYU Depth V2 (and Redwood RGB-D) supervised-depth datasets.

Parity targets:
  - NYU handler: reference ``depth/dataset/nyu_depth_v2.py:7-70`` — paired
    ``rgb_*.jpg`` / ``depth_*.png`` files per split dir, 16-bit depth in mm.
  - Redwood depth handler: reference ``depth/dataset/redwood_handler.py:8-60``.
  - DepthLoader: config-gated concat + loaders
    (reference ``depth/dataset/data_loader.py:17-169``).
"""

from __future__ import annotations

import glob
import os
from typing import Dict, List, Optional, Tuple

from deep_visual_slam_tpu.data.base import DepthSampleDataset
from deep_visual_slam_tpu.data.loader import ConcatDataset, DataLoader


def _paired_files(split_dir: str, rgb_glob: str, depth_glob: str):
    rgbs = sorted(glob.glob(os.path.join(split_dir, rgb_glob)))
    depths = sorted(glob.glob(os.path.join(split_dir, depth_glob)))
    n = min(len(rgbs), len(depths))
    return rgbs[:n], depths[:n]


def nyu_dataset(
    root_dir: str,
    split: str,
    image_size: Tuple[int, int],
    max_depth: float,
    is_train: bool,
) -> Optional[DepthSampleDataset]:
    """``<root>/<split>/{rgb,depth}/*`` or flat ``rgb_*/depth_*`` naming."""
    split_dir = os.path.join(root_dir, split)
    if not os.path.isdir(split_dir):
        return None
    rgb_dir = os.path.join(split_dir, "rgb")
    if os.path.isdir(rgb_dir):
        rgbs, depths = _paired_files(split_dir, "rgb/*", "depth/*")
    else:
        rgbs, depths = _paired_files(split_dir, "rgb_*", "depth_*")
    if not rgbs:
        return None
    return DepthSampleDataset(
        rgbs,
        depths,
        image_size,
        max_depth=max_depth,
        is_train=is_train,
        augment=is_train,
        depth_scale=1000.0,  # mm -> m (reference depth/dataset/common.py:76-84)
    )


class DepthLoader:
    """Config-gated supervised-depth loader assembly.

    Sources: ``Dataset.nyu_depth_v2`` and ``Dataset.redwood_depth`` flags,
    mirroring the reference's per-source enable switches
    (``depth/dataset/data_loader.py:17-169``).
    """

    def __init__(self, config: Dict):
        t = config["Train"]
        image_size = (t["img_h"], t["img_w"])
        max_depth = t["max_depth"]
        data_dir = config["Directory"]["data_dir"]

        train_sets: List = []
        valid_sets: List = []
        ds_cfg = config.get("Dataset", {})

        if ds_cfg.get("nyu_depth_v2", False):
            root = os.path.join(data_dir, "nyu_depth_v2")
            train_sets.append(nyu_dataset(root, "train", image_size, max_depth, True))
            valid_sets.append(nyu_dataset(root, "test", image_size, max_depth, False))

        if ds_cfg.get("redwood_depth", False):
            root = os.path.join(data_dir, "redwood")
            train_sets.append(nyu_dataset(root, "train", image_size, max_depth, True))
            valid_sets.append(nyu_dataset(root, "validation", image_size, max_depth, False))

        self.train_dataset = ConcatDataset([d for d in train_sets if d])
        self.valid_dataset = ConcatDataset([d for d in valid_sets if d])

        self.train_loader = DataLoader(
            self.train_dataset,
            t["batch_size"],
            shuffle=t.get("use_shuffle", True),
            drop_last=True,
            num_workers=t.get("num_workers", 8),
            seed=t.get("seed", 42),
        )
        self.valid_loader = DataLoader(
            self.valid_dataset,
            t["batch_size"],
            shuffle=False,
            drop_last=True,
            num_workers=t.get("num_workers", 8),
            seed=t.get("seed", 42),
        )
