"""Data pipeline tests: fake Redwood tree, loaders, jitter, prefetch."""

import json
import os

import cv2
import numpy as np
import pytest

from deep_visual_slam_tpu.data import (
    DataLoader,
    SyntheticVoDataset,
    VoDataLoader,
    collate,
    color_jitter,
    device_prefetch,
)
from deep_visual_slam_tpu.data.redwood import (
    RedwoodDataset,
    load_intrinsic,
    load_posegraph_json,
)
from deep_visual_slam_tpu.utils.config import load_config

H, W = 48, 64
from tests.conftest import N_FRAMES


def _config(root):
    return load_config(overrides={
        "Directory": {"data_dir": os.path.dirname(root) + "/"},
        "Train": {"img_h": H, "img_w": W, "batch_size": 4, "num_workers": 2},
    })


def test_posegraph_column_major(tmp_path):
    T = np.arange(16, dtype=np.float32).reshape(4, 4)
    path = tmp_path / "pg.json"
    with open(path, "w") as f:
        json.dump({"nodes": [{"pose": T.flatten(order="F").tolist()}]}, f)
    loaded = load_posegraph_json(str(path))[0]
    np.testing.assert_allclose(loaded, T)


def test_intrinsic_rescale(redwood_root):
    K = load_intrinsic(redwood_root, (H, W))
    np.testing.assert_allclose(K[0, 0], 525.0 * W / 640, rtol=1e-6)
    np.testing.assert_allclose(K[1, 1], 525.0 * H / 480, rtol=1e-6)
    assert K.shape == (4, 4)


def test_redwood_dataset_sample(redwood_root):
    ds = RedwoodDataset(redwood_root, "train", (H, W), is_train=True)
    assert len(ds.scenes) == 2
    assert len(ds) == 2 * (N_FRAMES - 6)  # max_gap=3 for train
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert s["target_image"].shape == (H, W, 3)
    assert s["source_left"].dtype == np.float32
    assert s["K_1"][0, 0] == pytest.approx(s["K"][0, 0] / 2)


def test_redwood_test_mode_gt_poses(redwood_root):
    ds = RedwoodDataset(redwood_root, "test", (H, W), is_train=False)
    s = ds.__getitem__(0, np.random.default_rng(0))
    # Camera moves +0.1m in x per frame; relative pose inv(T1)@T2 with gap 1.
    gt = s["gt_pose_left_to_target"]
    np.testing.assert_allclose(gt[0, 3], 0.1, atol=1e-6)
    np.testing.assert_allclose(gt[:3, :3], np.eye(3), atol=1e-6)


def test_vo_dataloader_batches(redwood_root):
    cfg = _config(redwood_root)
    dl = VoDataLoader(cfg)
    assert len(dl.train_dataset) > 0
    batches = list(dl.train_loader)
    assert len(batches) == len(dl.train_loader)
    b = batches[0]
    assert b["target_image"].shape == (4, H, W, 3)
    assert b["K"].shape == (4, 4, 4)


def test_dataloader_deterministic(redwood_root):
    ds = RedwoodDataset(redwood_root, "train", (H, W), is_train=True)
    dl1 = DataLoader(ds, 4, shuffle=True, seed=7)
    dl2 = DataLoader(ds, 4, shuffle=True, seed=7)
    b1 = next(iter(dl1))
    b2 = next(iter(dl2))
    np.testing.assert_allclose(b1["target_image"], b2["target_image"])
    # Different epoch -> different order.
    b1e2 = next(iter(dl1))
    assert not np.allclose(b1["target_image"], b1e2["target_image"])


def test_color_jitter_bounds(rng):
    imgs = rng.uniform(size=(3, 16, 16, 3)).astype(np.float32)
    out = color_jitter(imgs, np.random.default_rng(0))
    assert out.shape == imgs.shape
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert not np.allclose(out, imgs)


def test_device_prefetch(redwood_root):
    import jax

    cfg = _config(redwood_root)
    dl = VoDataLoader(cfg)
    n = 0
    for batch in device_prefetch(dl.train_loader, size=2):
        assert isinstance(batch["target_image"], jax.Array)
        n += 1
    assert n == len(dl.train_loader)


def test_synthetic_dataset_consistency():
    ds = SyntheticVoDataset((H, W), length=4, seed=0, is_train=False)
    s = ds.__getitem__(1)
    assert s["target_image"].shape == (H, W, 3)
    assert "gt_pose_target_to_right" in s
    batch = collate([ds.__getitem__(i) for i in range(2)])
    assert batch["gt_pose_target_to_right"].shape == (2, 4, 4)
