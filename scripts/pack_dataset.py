"""Offline dataset packer: scenes -> pre-resized uint8 memmap shards.

The TPU-native answer to SURVEY §7's input-pipeline hard part (the
reference feeds its GPU with 24 torch DataLoader worker processes,
``vo/dataset/vo_loader.py:208-216``): decode+resize every frame ONCE here,
then train from ``data/packed.py`` shards whose per-sample cost is three
memmap row copies.

Two modes:

  --config vo.yaml     pack every path-backed scene the config enables
                       (redwood/mars_logger/custom/irs), preserving folds
                       and GT poses, into <data_dir>/packed/<fold>/<scene>/
  --synthetic N        render N temporally coherent synthetic scenes
                       (``synthetic_slam_sequence``, known GT poses) —
                       the in-env path for the fixture training runs

Then enable ``Dataset.packed.mono: True`` (optionally
``Dataset.packed.root``) in the training config.

Examples:
  python scripts/pack_dataset.py --synthetic 24 --frames 96 --out results/packed
  python scripts/pack_dataset.py --config configs/vo.yaml
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def pack_synthetic(
    out_root: str, n_scenes: int, n_frames: int, size,
    generator: str = "plane",
) -> None:
    """``generator``: 'plane' = textured slanted plane
    (``synthetic_slam_sequence``), 'multidepth' = piecewise-planar ray-cast
    renders, 'mix' = alternate both — use 'mix' for fixture training whose
    model will be evaluated on multidepth SLAM scenes
    (``scripts/ba_ablation.py`` uses seeds 100-102; packer seeds start at
    1000, disjoint)."""
    from deep_visual_slam_tpu.data.packed import pack_scene
    from deep_visual_slam_tpu.data.synthetic import (
        synthetic_multidepth_sequence,
        synthetic_slam_sequence,
    )

    H, W = size
    # 80/10/10 scene split across folds; valid/test only once there are
    # at least 3 scenes (train must never be empty).
    n_valid = max(1, n_scenes // 10) if n_scenes >= 3 else 0
    n_test = max(1, n_scenes // 10) if n_scenes >= 3 else 0
    folds = (
        ["train"] * (n_scenes - n_valid - n_test)
        + ["valid"] * n_valid
        + ["test"] * n_test
    )
    for i, fold in enumerate(folds):
        out_dir = os.path.join(out_root, fold, f"scene_{i:03d}")
        if os.path.exists(os.path.join(out_dir, "images.npy")):
            print(f"{out_dir}: exists, skipping", flush=True)
            continue
        t0 = time.time()
        use_md = generator == "multidepth" or (generator == "mix" and i % 2)
        if use_md:
            frames, K, poses_cw, _ = synthetic_multidepth_sequence(
                n_frames, H, W, seed=1000 + i,
                step_translation=0.02, step_rotation=0.004,
            )
        else:
            frames, K, poses_cw = synthetic_slam_sequence(
                n_frames, H, W, seed=1000 + i,
                step_translation=0.02, step_rotation=0.004,
            )
        # SnippetDataset.poses expects camera-to-world (it forms
        # inv(p1) @ p2 relative poses); the generator emits T_cw.
        poses_wc = np.linalg.inv(poses_cw.astype(np.float64)).astype(
            np.float32
        )
        pack_scene(
            out_dir,
            (np.clip(frames, 0, 1) * 255).astype(np.uint8),
            K,
            poses=poses_wc,
        )
        print(f"{out_dir}: {n_frames}x{H}x{W} in {time.time() - t0:.1f}s",
              flush=True)


def _flatten(ds):
    from deep_visual_slam_tpu.data.loader import ConcatDataset

    if ds is None:
        return []
    if isinstance(ds, ConcatDataset):
        out = []
        for d in ds.datasets:
            out.extend(_flatten(d))
        return out
    return [ds]


def pack_config(config_path: str, out_root: str | None) -> None:
    from deep_visual_slam_tpu.data.base import SnippetDataset
    from deep_visual_slam_tpu.data.loader import VoDataLoader
    from deep_visual_slam_tpu.data.packed import pack_from_paths
    from deep_visual_slam_tpu.utils.config import load_config

    config = load_config(config_path)
    image_size = (config["Train"]["img_h"], config["Train"]["img_w"])
    out_root = out_root or os.path.join(
        config["Directory"]["data_dir"], "packed"
    )
    loader = VoDataLoader(config)
    for fold, ds in (
        ("train", loader.train_dataset),
        ("valid", loader.valid_dataset),
        ("test", loader.test_dataset),
    ):
        for k, scene in enumerate(_flatten(ds)):
            if not isinstance(scene, SnippetDataset):
                continue
            if not scene.rgb_paths or str(scene.rgb_paths[0]).startswith(
                "packed:"
            ):
                continue
            name = os.path.basename(
                os.path.dirname(os.path.abspath(str(scene.rgb_paths[0])))
            )
            out_dir = os.path.join(out_root, fold, f"{k:03d}_{name}")
            t0 = time.time()
            pack_from_paths(
                out_dir,
                scene.rgb_paths,
                scene.intrinsic,
                image_size,
                poses=scene.poses,
            )
            print(
                f"{out_dir}: {len(scene.rgb_paths)} frames in "
                f"{time.time() - t0:.1f}s",
                flush=True,
            )


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--config", default=None, help="pack this config's scenes")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="render N synthetic scenes instead")
    ap.add_argument("--frames", type=int, default=96, help="frames per scene")
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640),
                    metavar=("H", "W"))
    ap.add_argument("--out", default=None, help="output root (default "
                    "<data_dir>/packed)")
    ap.add_argument("--generator", choices=("plane", "multidepth", "mix"),
                    default="plane",
                    help="--synthetic scene renderer (mix: alternate both)")
    args = ap.parse_args()

    if args.synthetic:
        pack_synthetic(
            args.out or "results/packed", args.synthetic, args.frames,
            args.size, generator=args.generator,
        )
    elif args.config:
        pack_config(args.config, args.out)
    else:
        ap.error("one of --config / --synthetic is required")


if __name__ == "__main__":
    main()
