"""Golden tests for the JAX windowed photometric BA (g2o replacement)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_visual_slam_tpu.data.synthetic import (
    default_intrinsics,
    plane_depth,
    smooth_texture,
)
from deep_visual_slam_tpu.ops import (
    backproject,
    grid_sample,
    invert_se3,
    project,
    transformation_from_parameters,
)
from deep_visual_slam_tpu.slam.ba import BAProblem, photometric_ba

H, W = 96, 128
F = 4
P = 64


Z0 = 2.0  # constant-depth world plane z = Z0 (frame-0 camera = world)


def _analytic_tex(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Smooth analytic texture evaluable at ANY (x, y) — kills the
    interpolation-noise floor a raster texture would add. [..., 3]."""
    c0 = 0.5 + 0.2 * np.sin(2 * np.pi * x / 17.0) + 0.2 * np.cos(2 * np.pi * y / 23.0)
    c1 = 0.5 + 0.2 * np.sin(2 * np.pi * (x + y) / 29.0) + 0.15 * np.cos(2 * np.pi * x / 11.0)
    c2 = 0.5 + 0.2 * np.cos(2 * np.pi * (x - y) / 19.0) + 0.15 * np.sin(2 * np.pi * y / 13.0)
    return np.stack([c0, c1, c2], axis=-1).astype(np.float32)


def _render_view(Kn: np.ndarray, T_cw: np.ndarray) -> np.ndarray:
    """Exact view of the textured plane z_w = Z0 from camera pose T_cw:
    ray-plane intersection per pixel, then evaluate the analytic texture at
    the frame-0 projection of the intersection point."""
    fx, fy, cx, cy = Kn[0, 0], Kn[1, 1], Kn[0, 2], Kn[1, 2]
    u, v = np.meshgrid(np.arange(W, dtype=np.float64), np.arange(H, dtype=np.float64))
    rays = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], -1)  # [H,W,3]
    T_wc = np.linalg.inv(T_cw.astype(np.float64))
    Rw, tw = T_wc[:3, :3], T_wc[:3, 3]
    dirs = rays @ Rw.T  # world-frame ray directions
    lam = (Z0 - tw[2]) / dirs[..., 2]
    X_w = dirs * lam[..., None] + tw
    # Project into frame 0 (identity pose) and evaluate the texture there.
    x0 = X_w[..., 0] / X_w[..., 2] * fx + cx
    y0 = X_w[..., 1] / X_w[..., 2] * fy + cy
    return _analytic_tex(x0, y0)


def _plane_depth_at(Kn: np.ndarray, T_cw: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Exact depth of the plane at pixels ``uv`` of camera T_cw."""
    fx, fy, cx, cy = Kn[0, 0], Kn[1, 1], Kn[0, 2], Kn[1, 2]
    rays = np.stack(
        [(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy, np.ones(len(uv))], -1
    )
    T_wc = np.linalg.inv(T_cw.astype(np.float64))
    dirs = rays @ T_wc[:3, :3].T
    lam = (Z0 - T_wc[2, 3]) / dirs[:, 2]
    return lam.astype(np.float32)  # depth = lam since ray z-component is 1


def _make_problem(seed=0, pose_noise=0.01, depth_noise=0.05):
    """Synthetic plane scene: frame 0 hosts all points; frames 1..F-1 are
    exactly rendered views under known camera motion. Returns (problem, truth)."""
    rng = np.random.default_rng(seed)
    K = np.asarray(default_intrinsics(H, W))
    true_T_cw = [np.eye(4, dtype=np.float32)]
    images = [_render_view(K, np.eye(4))]
    for i in range(1, F):
        aa = rng.uniform(-0.02, 0.02, 3).astype(np.float32)
        t = rng.uniform(-0.1, 0.1, 3).astype(np.float32)
        T_cw = np.asarray(
            transformation_from_parameters(jnp.asarray(aa)[None], jnp.asarray(t)[None])
        )[0]
        images.append(_render_view(K, T_cw))
        true_T_cw.append(T_cw)
    true_T_cw = np.asarray(true_T_cw)
    images = jnp.asarray(np.stack(images))

    # Points: grid of pixels in frame 0, true depths from the plane (= Z0).
    margin = 16
    xs = np.linspace(margin, W - margin, 8)
    ys = np.linspace(margin, H - margin, 8)
    uv = np.stack(np.meshgrid(xs, ys), -1).reshape(-1, 2).astype(np.float32)
    true_depths = _plane_depth_at(K, np.eye(4), uv)
    K = jnp.asarray(K)

    # Perturb poses (not frame 0) and depths.
    init_T = true_T_cw.copy()
    for i in range(1, F):
        aa = rng.uniform(-pose_noise, pose_noise, 3).astype(np.float32)
        t = rng.uniform(-pose_noise, pose_noise, 3).astype(np.float32)
        dT = np.asarray(
            transformation_from_parameters(jnp.asarray(aa)[None], jnp.asarray(t)[None])
        )[0]
        init_T[i] = dT @ init_T[i]
    init_depths = true_depths * (
        1.0 + rng.uniform(-depth_noise, depth_noise, P).astype(np.float32)
    )

    problem = BAProblem(
        images=images,
        K=K,
        poses=jnp.asarray(init_T),
        depths=jnp.asarray(init_depths),
        host_uv=jnp.asarray(uv),
        host_idx=jnp.zeros(P, jnp.int32),
        obs_mask=jnp.ones((P, F), bool),
        weight=jnp.ones(P),
    )
    truth = {"poses": true_T_cw, "depths": true_depths}
    return problem, truth


def test_ba_zero_noise_stays_at_optimum():
    problem, truth = _make_problem(pose_noise=0.0, depth_noise=0.0)
    poses, depths, diag = photometric_ba(problem, num_iters=3)
    # Already at the optimum: cost stays at the bilinear-sampling floor and
    # the state barely moves.
    assert float(diag["chi2"]) < 0.01
    np.testing.assert_allclose(np.asarray(poses), truth["poses"], atol=1e-3)
    np.testing.assert_allclose(np.asarray(depths), truth["depths"], rtol=0.02)


def test_ba_converges_from_perturbation():
    problem, truth = _make_problem(pose_noise=0.01, depth_noise=0.05)

    # Initial cost.
    _, _, diag0 = photometric_ba(problem, num_iters=1, init_lambda=1e10)
    chi2_init = float(diag0["chi2_history"][0])

    poses, depths, diag = photometric_ba(problem, num_iters=10)
    chi2_final = float(diag["chi2"])
    assert chi2_final < 0.05 * chi2_init, (chi2_init, chi2_final)

    # Pose error vs truth must shrink substantially (allowing gauge/scale
    # freedom to absorb a little).
    def pose_err(Ts):
        return np.mean(
            [np.linalg.norm(np.asarray(Ts[i]) - truth["poses"][i]) for i in range(1, F)]
        )

    err_init = pose_err(problem.poses)
    err_final = pose_err(poses)
    assert err_final < 0.7 * err_init, (err_init, err_final)


def test_ba_masked_edges_ignored():
    """Corrupting a masked-out frame must not affect the solution."""
    problem, _ = _make_problem(pose_noise=0.005, depth_noise=0.02)
    mask = np.array(problem.obs_mask)
    mask[:, F - 1] = False  # drop all edges into the last frame
    corrupted_images = np.array(problem.images)
    corrupted_images[F - 1] = 0.0  # nuke that frame's pixels

    p1 = problem._replace(obs_mask=jnp.asarray(mask))
    p2 = problem._replace(
        obs_mask=jnp.asarray(mask), images=jnp.asarray(corrupted_images)
    )
    poses1, depths1, _ = photometric_ba(p1, num_iters=4)
    poses2, depths2, _ = photometric_ba(p2, num_iters=4)
    np.testing.assert_allclose(
        np.asarray(poses1)[: F - 1], np.asarray(poses2)[: F - 1], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(depths1), np.asarray(depths2), atol=1e-5)


def test_ba_first_pose_fixed():
    problem, truth = _make_problem(pose_noise=0.01, depth_noise=0.05)
    poses, _, _ = photometric_ba(problem, num_iters=5)
    np.testing.assert_allclose(np.asarray(poses)[0], truth["poses"][0], atol=1e-7)


def test_ba_huber_downweights_outliers():
    """A grossly corrupted point must not drag the solution (vs no-huber)."""
    problem, truth = _make_problem(pose_noise=0.0, depth_noise=0.0)
    depths = np.array(problem.depths)
    depths[0] = 8.0  # massive outlier depth
    p = problem._replace(depths=jnp.asarray(depths))
    poses, out_depths, diag = photometric_ba(p, num_iters=8)
    # Other depths stay near truth despite the outlier.
    np.testing.assert_allclose(
        np.asarray(out_depths)[1:], truth["depths"][1:], rtol=0.05
    )
