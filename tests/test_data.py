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


# ---------------------------------------------------------------- packed
def test_packed_roundtrip_matches_path_pipeline(tmp_path, redwood_root):
    """Packing a path-backed scene and reading it back through
    PackedSnippetDataset yields the SAME samples as the cv2 decode path
    (bit-exact modulo the single uint8 quantization both pipelines share)."""
    from deep_visual_slam_tpu.data.packed import (
        PackedSnippetDataset,
        pack_from_paths,
    )

    src = RedwoodDataset(redwood_root, "train", (H, W), is_train=True)
    scene = src.scenes[0] if hasattr(src, "scenes") else src
    scene.augment = False  # jitter would amplify the uint8 quantization
    pack_from_paths(
        str(tmp_path / "s0"), scene.rgb_paths, scene.intrinsic, (H, W),
        poses=scene.poses, chunk=7,
    )
    packed = PackedSnippetDataset(
        str(tmp_path / "s0"), (H, W), is_train=True, augment=False
    )
    assert len(packed) == len(scene)
    rng_a, rng_b = np.random.default_rng(3), np.random.default_rng(3)
    a = scene.__getitem__(2, rng_a)
    b = packed.__getitem__(2, rng_b)
    for k in a:
        np.testing.assert_allclose(a[k], b[k], atol=1 / 255 + 1e-6, err_msg=k)


def test_packed_synthetic_fold_and_loader(tmp_path):
    """Synthetic packer -> Dataset.packed config -> VoDataLoader batches,
    with GT relative poses available in eval mode."""
    import subprocess
    import sys as _sys

    from deep_visual_slam_tpu.data.packed import (
        PackedSnippetDataset,
        list_packed_scenes,
    )
    from scripts.pack_dataset import pack_synthetic

    pack_synthetic(str(tmp_path / "packed"), 3, 12, (H, W))
    train_scenes = list_packed_scenes(str(tmp_path / "packed" / "train"))
    assert len(train_scenes) == 1 and \
        len(list_packed_scenes(str(tmp_path / "packed" / "valid"))) == 1

    cfg = load_config(overrides={
        "Directory": {"data_dir": str(tmp_path) + "/"},
        "Dataset": {
            "redwood": {"mono": False},
            "packed": {"mono": True, "root": str(tmp_path / "packed")},
        },
        "Train": {"img_h": H, "img_w": W, "batch_size": 2, "num_workers": 2},
    })
    dl = VoDataLoader(cfg)
    b = next(iter(dl.train_loader))
    assert b["target_image"].shape == (2, H, W, 3)
    assert b["target_image"].dtype == np.float32
    assert 0.0 <= b["target_image"].min() and b["target_image"].max() <= 1.0
    assert b["K_1"][0, 0, 0] == pytest.approx(b["K"][0, 0, 0] / 2)

    # Eval mode: GT relative poses from the packed camera-to-world poses.
    ev = PackedSnippetDataset(train_scenes[0], (H, W), is_train=False)
    s = ev.__getitem__(0, np.random.default_rng(0))
    gt = s["gt_pose_left_to_target"]
    assert gt.shape == (4, 4)
    assert np.isfinite(gt).all()
    assert np.linalg.norm(gt[:3, 3]) > 1e-5  # camera actually moved

    # Shard refuses a mismatched training resolution (explicit, not silent).
    with pytest.raises(ValueError):
        PackedSnippetDataset(train_scenes[0], (H * 2, W * 2))


def test_uint8_h2d_path(tmp_path):
    """Train.uint8_h2d ships uint8 batches whose /255 matches the f32 path
    (same rng => same snippet indices), and forces host jitter off."""
    from deep_visual_slam_tpu.data.packed import (
        PackedSnippetDataset,
        list_packed_scenes,
    )
    from scripts.pack_dataset import pack_synthetic

    pack_synthetic(str(tmp_path / "packed"), 3, 12, (H, W))
    scene = list_packed_scenes(str(tmp_path / "packed" / "train"))[0]

    f32 = PackedSnippetDataset(scene, (H, W), augment=False)
    u8 = PackedSnippetDataset(scene, (H, W), augment=False)
    u8.output_uint8 = True
    a = f32.__getitem__(1, np.random.default_rng(7))
    b = u8.__getitem__(1, np.random.default_rng(7))
    assert b["target_image"].dtype == np.uint8
    np.testing.assert_allclose(
        a["target_image"], b["target_image"].astype(np.float32) / 255.0,
        atol=1e-7,
    )

    cfg = load_config(overrides={
        "Directory": {"data_dir": str(tmp_path) + "/"},
        "Dataset": {
            "redwood": {"mono": False},
            "packed": {"mono": True, "root": str(tmp_path / "packed")},
        },
        "Train": {
            "img_h": H, "img_w": W, "batch_size": 2, "num_workers": 2,
            "uint8_h2d": True, "device_augment": True,
        },
    })
    dl = VoDataLoader(cfg)
    batch = next(iter(dl.train_loader))
    assert batch["target_image"].dtype == np.uint8
    assert batch["K"].dtype == np.float32  # intrinsics untouched
    for ds in dl.train_dataset.datasets:
        for d in getattr(ds, "datasets", [ds]):
            assert d.output_uint8 and not d.augment


def test_packed_dataset_pickles(tmp_path):
    """memmap-backed datasets must survive pickling (xdist/subprocess)."""
    import pickle

    from deep_visual_slam_tpu.data.packed import PackedSnippetDataset
    from scripts.pack_dataset import pack_synthetic

    pack_synthetic(str(tmp_path / "p"), 1, 8, (H, W))
    ds = PackedSnippetDataset(
        str(tmp_path / "p" / "train" / "scene_000"), (H, W)
    )
    ds2 = pickle.loads(pickle.dumps(ds))
    a = ds.__getitem__(0, np.random.default_rng(1))
    b = ds2.__getitem__(0, np.random.default_rng(1))
    np.testing.assert_allclose(a["target_image"], b["target_image"])


def test_multidepth_sequence_geometry():
    """The piecewise-planar ray-cast generator must be exactly
    self-consistent: warping frame 1 into frame 0 with the emitted GT depth
    and poses reproduces frame 0 away from occlusion boundaries (to the
    bilinear-interpolation floor), and the scene must actually contain
    multiple depth layers (that is its reason to exist — the single-plane
    generator is BA-degenerate)."""
    import jax.numpy as jnp

    from deep_visual_slam_tpu.data.synthetic import synthetic_multidepth_sequence
    from deep_visual_slam_tpu.ops import backproject, grid_sample, project

    H, W = 96, 128
    frames, K, poses, depths = synthetic_multidepth_sequence(3, H, W, seed=3)
    assert frames.shape == (3, H, W, 3) and depths.shape == (3, H, W)
    # Multiple distinct depth layers visible in frame 0.
    layers = np.unique(np.round(depths[0], 2))
    assert len(layers) >= 3, layers

    d0 = jnp.asarray(depths[0][None])
    Kb = jnp.asarray(K[None])
    pts = backproject(d0, jnp.linalg.inv(Kb))
    T_rel = jnp.asarray(poses[1] @ np.linalg.inv(poses[0]))[None]
    grid = project(pts, Kb, T_rel)
    warped = grid_sample(
        jnp.asarray(frames[1][None]), grid, align_corners=True,
        padding_mode="border",
    )
    err = np.abs(np.asarray(warped[0]) - frames[0])
    gd = np.abs(np.gradient(depths[0])[0]) + np.abs(np.gradient(depths[0])[1])
    interior = gd < 0.01
    interior[:4] = interior[-4:] = False
    interior[:, :4] = interior[:, -4:] = False
    assert err[interior].mean() < 0.02
