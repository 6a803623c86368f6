"""MarsLogger / custom rig / IRS / stereo handler tests (on-disk fixtures)."""

import json
import os

import cv2
import numpy as np

from deep_visual_slam_tpu.data.handlers import (
    CustomRigDataset,
    IrsDataset,
    MarsLoggerDataset,
    StereoSnippetDataset,
    rescale_intrinsic_4x4,
)

H, W = 48, 64


def test_rescale_intrinsic():
    K3 = np.array([[480.0, 0, 480.0], [0, 480.0, 270.0], [0, 0, 1]])
    K4 = rescale_intrinsic_4x4(K3, (H, W), (540, 960))
    assert K4.shape == (4, 4)
    np.testing.assert_allclose(K4[0, 0], 480 * W / 960)
    np.testing.assert_allclose(K4[1, 2], 270 * H / 540)


def test_mars_logger_dataset(tmp_path, rng):
    scene = tmp_path / "scene_0"
    scene.mkdir()
    # Write a 12-frame mp4.
    writer = cv2.VideoWriter(
        str(scene / "movie.mp4"), cv2.VideoWriter_fourcc(*"mp4v"), 10, (80, 60)
    )
    for i in range(12):
        writer.write((rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8))
    writer.release()
    calib = tmp_path / "calibration_results"
    calib.mkdir()
    with open(calib / "calibration_results.json", "w") as f:
        json.dump({"image_height": 60, "image_width": 80}, f)
    np.save(calib / "camera_matrix.npy",
            np.array([[100.0, 0, 40], [0, 110.0, 30], [0, 0, 1]]))

    ds = MarsLoggerDataset(str(scene), str(calib), (H, W), is_train=True)
    assert len(ds) == 12 - 6
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert s["target_image"].shape == (H, W, 3)
    # Frames are rotated 90° CCW -> fx comes from the native fy.
    assert abs(s["K"][0, 0] - 110.0 * W / 60) < 1e-4
    # Second construction reuses the extracted frames (idempotent).
    ds2 = MarsLoggerDataset(str(scene), str(calib), (H, W))
    assert len(ds2) == len(ds)


def test_custom_rig_dataset(tmp_path, rng):
    scene = tmp_path / "rig_scene"
    (scene / "rgb_left").mkdir(parents=True)
    (scene / "sensor").mkdir()
    for i in range(10):
        cv2.imwrite(str(scene / "rgb_left" / f"{i:05d}.jpg"),
                    (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8))
    np.save(scene / "sensor" / "left_intrinsics.npy",
            np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]]))
    ds = CustomRigDataset(str(scene), (H, W))
    assert len(ds) == 4
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert s["source_right"].shape == (H, W, 3)


def test_irs_dataset(tmp_path, rng):
    scene = tmp_path / "irs_scene"
    scene.mkdir()
    for i in range(8):
        cv2.imwrite(str(scene / f"l_{i:04d}.png"),
                    (rng.uniform(size=(54, 96, 3)) * 255).astype(np.uint8))
    ds = IrsDataset(str(scene), (H, W))
    assert len(ds) == 2
    s = ds.__getitem__(0, np.random.default_rng(0))
    assert abs(s["K"][0, 0] - 480.0 * W / 960) < 1e-4


def test_stereo_dataset(tmp_path, rng):
    left, right = [], []
    for i in range(5):
        lp = str(tmp_path / f"l{i}.jpg")
        rp = str(tmp_path / f"r{i}.jpg")
        cv2.imwrite(lp, (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8))
        cv2.imwrite(rp, (rng.uniform(size=(48, 64, 3)) * 255).astype(np.uint8))
        left.append(lp)
        right.append(rp)
    baseline = np.eye(4)
    baseline[0, 3] = 0.12
    K = np.eye(4)
    ds = StereoSnippetDataset(
        right, left, [K] * 5, [baseline] * 5, (H, W), is_train=True
    )
    assert len(ds) == 5
    s = ds.__getitem__(2, np.random.default_rng(0))
    assert s["source_image"].shape == (H, W, 3)
    np.testing.assert_allclose(s["pose"][0, 3], 0.12)
