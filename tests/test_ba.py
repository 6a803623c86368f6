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
    # the state barely moves. The 2e-3 tolerance is the interpolation-noise
    # floor: the rendered views are exact but the solver samples them
    # bilinearly, so the photometric optimum sits O(1e-3) off GT and which
    # noise-floor steps LM accepts depends on acceptance bookkeeping
    # (measured 9e-4 with plain acceptance, 1.8e-3 with the escape-proof
    # rule — both fitting the same floor, neither a convergence failure).
    assert float(diag["chi2"]) < 0.01
    np.testing.assert_allclose(np.asarray(poses), truth["poses"], atol=2e-3)
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
    """A grossly corrupted point must not drag the solution: the run WITH
    the outlier must land where the clean run lands. (Comparing against the
    clean solution, not absolute truth: the single-plane fixture has the
    plane-induced homography gauge ambiguity, so with exact rotation
    Jacobians the optimizer may legally trade pose against depth — both
    runs drift identically unless the outlier drags.)

    The comparison is monocular-scale-aligned: the global scale gauge is
    photometrically flat (depths x s, translations x s), so the outlier may
    push along it freely — the eval harness's median-scale correction
    removes it downstream, and what matters here is that the scene SHAPE
    and scaled poses are untouched."""
    problem, truth = _make_problem(pose_noise=0.0, depth_noise=0.0)
    clean_poses, clean_depths, _ = photometric_ba(problem, num_iters=8)
    depths = np.array(problem.depths)
    depths[0] = 8.0  # massive outlier depth
    p = problem._replace(depths=jnp.asarray(depths))
    poses, out_depths, diag = photometric_ba(p, num_iters=8)
    cd = np.asarray(clean_depths)
    out = np.asarray(out_depths)
    s = np.median(cd[1:] / out[1:])
    np.testing.assert_allclose(out[1:] * s, cd[1:], rtol=0.05)
    np.testing.assert_allclose(
        np.asarray(poses)[:, :3, 3] * s,
        np.asarray(clean_poses)[:, :3, 3],
        atol=5e-3,
    )
    np.testing.assert_allclose(
        np.asarray(poses)[:, :3, :3], np.asarray(clean_poses)[:, :3, :3],
        atol=5e-3,
    )


def test_closed_form_jacobian_matches_autodiff():
    """The production linearization (batched closed-form SE(3)/pinhole
    Jacobians chained with the carried bilinear gradient,
    `edges_evaluate` + `edges_jacobian`) must equal forward-mode autodiff
    straight through the image sampler (`edge_residual`) — same derivative,
    computed with zero gathers. Covers in-bounds AND out-of-bounds edges."""
    from deep_visual_slam_tpu.slam.ba import (
        bilinear_sample_stack,
        edge_residual,
        edges_evaluate,
        edges_jacobian,
    )

    problem, _ = _make_problem(pose_noise=0.05, depth_noise=0.2)
    images, K = problem.images, problem.K
    zeros6 = jnp.zeros(6)
    zero = jnp.zeros(())

    e_point, e_dest = np.meshgrid(np.arange(P), np.arange(1, F), indexing="ij")
    e_point, e_dest = e_point.ravel(), e_dest.ravel()
    # Force some OOB edges: a large x-translation on the last few dest poses
    # and a sub-threshold depth on one point.
    poses = problem.poses.at[-1, 0, 3].add(5.0)
    depths = problem.depths.at[3].set(5e-4)
    e_host = jnp.zeros(len(e_point), jnp.int32)
    e_dest = jnp.asarray(e_dest, jnp.int32)
    e_point = jnp.asarray(e_point, jnp.int32)
    uv = problem.host_uv[e_point]
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]
    e_dir = jnp.stack(
        [(uv[:, 0] - cx) / fx, (uv[:, 1] - cy) / fy, jnp.ones_like(uv[:, 0])],
        axis=-1,
    )
    I_host = jax.vmap(
        lambda hi, uv1: bilinear_sample_stack(images, hi, uv1)
    )(e_host, uv)

    r, geom = edges_evaluate(
        poses, depths, e_dest, e_host, e_point, e_dir, I_host, images, K
    )
    Jd, Jh, Jz = edges_jacobian(geom, e_dir, K)
    assert not bool(jnp.all(geom.ok)), "fixture should include OOB edges"

    def ref_jac(Td, Th, d, uv1, hi, di):
        f = lambda xi_d, xi_h, dd: edge_residual(  # noqa: E731
            xi_d, xi_h, dd, Td, Th, d, uv1, hi, di, images, K
        )[0]
        return jax.jacfwd(f, argnums=(0, 1, 2))(zeros6, zeros6, zero)

    Jd_ref, Jh_ref, Jz_ref = jax.vmap(
        lambda di, pi, uv1, hi: ref_jac(
            poses[di], poses[hi], depths[pi], uv1, hi, di
        )
    )(e_dest, e_point, uv, e_host)
    r_ref, _ = jax.vmap(
        lambda di, pi, uv1, hi: edge_residual(
            zeros6, zeros6, zero, poses[di], poses[hi], depths[pi],
            uv1, hi, di, images, K,
        )
    )(e_dest, e_point, uv, e_host)

    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Jd), np.asarray(Jd_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(Jh), np.asarray(Jh_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(Jz), np.asarray(Jz_ref), atol=2e-4)


def test_gather_free_jacobian_matches_autodiff_through_sampler():
    """The production linearization (analytic bilinear gradient chained with
    geometry-only jacfwd, `edge_jacobian`) must equal forward-mode autodiff
    straight through the image sampler (`edge_residual`) — it is the same
    derivative computed without touching the image. Covers in-bounds AND
    out-of-bounds (zeroed) edges."""
    from deep_visual_slam_tpu.slam.ba import (
        bilinear_sample_stack,
        edge_jacobian,
        edge_residual,
        edge_residual_grad,
    )

    problem, _ = _make_problem(pose_noise=0.05, depth_noise=0.2)
    images, K = problem.images, problem.K
    zeros6 = jnp.zeros(6)
    zero = jnp.zeros(())

    # Every (point, dest!=host) edge; big pose noise pushes some OOB.
    e_point, e_dest = np.meshgrid(np.arange(P), np.arange(1, F), indexing="ij")
    e_point, e_dest = e_point.ravel(), e_dest.ravel()
    T_dest = problem.poses[e_dest]
    # Force some OOB edges: a large x-translation on the last few dest poses
    # and a sub-threshold depth on one point.
    T_dest = T_dest.at[-5:, 0, 3].add(5.0)
    T_host = problem.poses[np.zeros_like(e_dest)]
    depth = problem.depths[e_point].at[3].set(5e-4)
    uv = problem.host_uv[e_point]
    host_i = jnp.zeros(len(e_point), jnp.int32)
    dest_i = jnp.asarray(e_dest, jnp.int32)

    def ref_jac(Td, Th, d, uv1, hi, di):
        f = lambda xi_d, xi_h, dd: edge_residual(  # noqa: E731
            xi_d, xi_h, dd, Td, Th, d, uv1, hi, di, images, K
        )[0]
        return jax.jacfwd(f, argnums=(0, 1, 2))(zeros6, zeros6, zero)

    Jd_ref, Jh_ref, Jz_ref = jax.vmap(ref_jac)(
        T_dest, T_host, depth, uv, host_i, dest_i
    )

    I_host = jax.vmap(
        lambda hi, uv1: bilinear_sample_stack(images, hi, uv1)
    )(host_i, uv)
    r_new, ok, gI = jax.vmap(
        edge_residual_grad, in_axes=(0, 0, 0, 0, 0, 0, None, None)
    )(T_dest, T_host, depth, uv, I_host, dest_i, images, K)
    Jd, Jh, Jz = jax.vmap(
        edge_jacobian, in_axes=(0, 0, 0, 0, 0, None, None)
    )(T_dest, T_host, depth, uv, gI, images, K)

    assert not bool(jnp.all(ok)), "fixture should include OOB edges"
    r_ref, ok_ref = jax.vmap(
        lambda Td, Th, d, uv1, hi, di: edge_residual(
            zeros6, zeros6, zero, Td, Th, d, uv1, hi, di, images, K
        )
    )(T_dest, T_host, depth, uv, host_i, dest_i)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ok_ref))
    np.testing.assert_allclose(np.asarray(r_new), np.asarray(r_ref), atol=1e-6)
    np.testing.assert_allclose(np.asarray(Jd), np.asarray(Jd_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(Jh), np.asarray(Jh_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(Jz), np.asarray(Jz_ref), atol=2e-4)


def test_ba_pyramid_converges_from_coarse_basin():
    """Coarse-to-fine BA (``photometric_ba_pyramid``) must converge from a
    perturbation whose initial flow exceeds the single-scale bilinear basin
    (~1 px), and the scaled solve must be exactly the base solver at s=1.
    The escape-proof acceptance rule is load-bearing here: without it a
    coarse level can 'improve' chi2 by pushing points off the image."""
    from deep_visual_slam_tpu.slam.ba import (
        photometric_ba_pyramid,
        photometric_ba_scaled,
    )

    problem, truth = _make_problem(pose_noise=0.03, depth_noise=0.05)

    def pose_err(Ts):
        return np.mean(
            [np.linalg.norm(np.asarray(Ts[i]) - truth["poses"][i]) for i in range(1, F)]
        )

    err_init = pose_err(problem.poses)
    poses, depths, diag = photometric_ba_pyramid(
        problem, levels=(2, 1), iters_per_level=(6, 6)
    )
    assert np.all(np.isfinite(np.asarray(poses)))
    assert pose_err(poses) < 0.6 * err_init, (err_init, pose_err(poses))

    # s=1 passthrough is the base solver bit-for-bit.
    p1, d1, _ = photometric_ba_scaled(problem, scale=1, num_iters=4)
    p2, d2, _ = photometric_ba(problem, num_iters=4)
    np.testing.assert_array_equal(np.asarray(p1), np.asarray(p2))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d2))


def test_ba_scaled_intrinsics_zero_noise():
    """At scale 2 with a zero-noise init, the downsampled solve must stay
    near the optimum, AND the pixel-center intrinsics rescale must beat the
    naive ``cx/s`` (half-pixel-shifted) convention on initial chi2.

    The pose atol is 1e-2, not the scale-1 2e-3: box-filtering the rendered
    views shifts the photometric optimum of the DOWNSAMPLED problem by its
    own interpolation floor (measured: 5.9e-3 max pose drift at s=2 with
    the correct convention, 2.2e-2 initial chi2 vs 2.7e-3 at s=1). The
    convention itself is pinned by the chi2 comparison below — at a GT
    init the correct rescale must photometrically out-align a deliberate
    half-pixel cx/cy error (measured 0.0219 vs 0.0342, deterministic)."""
    from deep_visual_slam_tpu.slam.ba import (
        photometric_ba,
        photometric_ba_scaled,
    )

    problem, truth = _make_problem(pose_noise=0.0, depth_noise=0.0)
    poses, depths, diag = photometric_ba_scaled(problem, scale=2, num_iters=3)
    np.testing.assert_allclose(np.asarray(poses), truth["poses"], atol=1e-2)
    np.testing.assert_allclose(np.asarray(depths), truth["depths"], rtol=0.05)

    # Pin the convention: initial chi2 (history[0]) under the correct
    # pixel-center rescale vs the naive cx/s one, same downsampled images.
    chi2_ok = float(diag["chi2_history"][0])
    Fn, H, W, _ = problem.images.shape
    s = 2
    images = problem.images[:, : (H // s) * s, : (W // s) * s].reshape(
        Fn, H // s, s, W // s, s, -1
    ).mean(axis=(2, 4))
    K = problem.K
    K_bad = (
        K.at[0, 0].set(K[0, 0] / s)
        .at[1, 1].set(K[1, 1] / s)
        .at[0, 2].set(K[0, 2] / s)
        .at[1, 2].set(K[1, 2] / s)
    )
    broken = problem._replace(
        images=images, K=K_bad, host_uv=problem.host_uv / s
    )
    _, _, diag_bad = photometric_ba(broken, num_iters=1)
    chi2_bad = float(diag_bad["chi2_history"][0])
    assert chi2_ok < 0.8 * chi2_bad, (chi2_ok, chi2_bad)


def test_depth_damping_makes_ba_improve_poses_on_multidepth():
    """THE ablation claim, pinned as a test (docs/ba_ablation_r03.json):
    on identifiable multidepth geometry with noisy-odometry poses and a GT
    depth init, damped BA (``depth_damping=1``, the Map default) must
    IMPROVE mean pose error, while free depths (``0.0``) walk the depths
    off (texture aliasing at SLAM-window baselines — see the
    ``photometric_ba`` docstring) and must show the measured >0.3 m mean
    depth drift that motivates the default."""
    from deep_visual_slam_tpu.data.synthetic import (
        synthetic_multidepth_sequence,
    )
    from deep_visual_slam_tpu.slam.ba import photometric_ba_pyramid

    Fh, Hh, Ww = 5, 96, 128
    frames, K, gt_cw, gt_depths = synthetic_multidepth_sequence(
        Fh, Hh, Ww, seed=7, step_translation=0.02, step_rotation=0.004
    )
    rng = np.random.default_rng(3)
    poses = [gt_cw[0].copy()]
    for i in range(1, Fh):
        rel = gt_cw[i] @ np.linalg.inv(gt_cw[i - 1])
        aa = rng.normal(0, np.deg2rad(0.3), 3)
        th = np.linalg.norm(aa)
        k = aa / max(th, 1e-12)
        Kx = np.array(
            [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0.0]]
        )
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)
        rel = np.array(rel)
        rel[:3, :3] = R @ rel[:3, :3]
        rel[:3, 3] += rng.normal(0, 0.005, 3)
        poses.append(rel @ poses[-1])
    poses = np.stack(poses).astype(np.float32)

    Pn = 128
    ys = np.linspace(8, Hh - 9, 12).astype(int)
    xs = np.linspace(8, Ww - 9, 12).astype(int)
    uv = np.array([(x, y) for y in ys for x in xs], np.float32)[:Pn]
    d_gt = np.array(
        [gt_depths[0][int(v), int(u)] for u, v in uv], np.float32
    )
    problem = BAProblem(
        images=jnp.asarray(frames, jnp.float32),
        K=jnp.asarray(K, jnp.float32),
        poses=jnp.asarray(poses),
        depths=jnp.asarray(d_gt),
        host_uv=jnp.asarray(uv),
        host_idx=jnp.zeros(Pn, jnp.int32),
        obs_mask=jnp.ones((Pn, Fh), bool),
        weight=jnp.ones(Pn, jnp.float32),
    )

    def pose_err(Ts):
        Ts = np.asarray(Ts, np.float64)
        return float(
            np.mean(
                [np.linalg.norm(Ts[i] - gt_cw[i]) for i in range(1, Fh)]
            )
        )

    err0 = pose_err(poses)
    p_damped, d_damped, _ = photometric_ba_pyramid(
        problem, levels=(2, 1), iters_per_level=(6, 6), depth_damping=1.0
    )
    p_free, d_free, _ = photometric_ba_pyramid(
        problem, levels=(2, 1), iters_per_level=(6, 6), depth_damping=0.0
    )
    err_damped = pose_err(p_damped)
    err_free = pose_err(p_free)
    drift_damped = float(np.mean(np.abs(np.asarray(d_damped) - d_gt)))
    drift_free = float(np.mean(np.abs(np.asarray(d_free) - d_gt)))

    assert err_damped < 0.7 * err0, (err0, err_damped)
    assert err_damped < err_free, (err_damped, err_free)
    assert drift_damped < 0.05, drift_damped
    assert drift_free > 0.3, drift_free


def test_odometry_prior_recovers_weakly_observed_frame():
    """The D3VO relative-pose prior (``prior_weight``) must actively pull a
    photometrically starved frame BACK to the odometry chain, not just damp
    it. This pins the captured r03 failure: a window frame observed by a
    handful of edges took an ACCEPTED 1.5 m / 32 deg texture-aliased step
    once LM's lambda had decayed (chi2 did drop), exploding the trajectory
    — with the prior, that displaced state is exactly what the next solve
    must repair."""
    from deep_visual_slam_tpu.ops.se3 import se3_inv

    problem, truth = _make_problem(pose_noise=0.01, depth_noise=0.0)
    # Starve frame 2 of photometric evidence and displace it 0.5 m — the
    # post-aliased-step state.
    obs = np.asarray(problem.obs_mask).copy()
    obs[:, 2] = False
    init = np.asarray(problem.poses)
    displaced = init.copy()
    displaced[2, 0, 3] += 0.5
    # Prior = the odometry chain BEFORE the bad step (the SLAM driver's
    # composed rels; here the undisplaced init chain).
    prior_rel = jnp.asarray(init[1:]) @ se3_inv(jnp.asarray(init[:-1]))
    starved = problem._replace(
        obs_mask=jnp.asarray(obs), poses=jnp.asarray(displaced)
    )

    p_free, _, _ = photometric_ba(starved, num_iters=8, prior_weight=0.0)
    p_prior, _, _ = photometric_ba(
        starved, num_iters=8, prior_weight=1e3, prior_rel=prior_rel
    )

    def frame2_off(Ts):
        """Distance of frame 2 from its pre-displacement odometry pose."""
        dT = np.asarray(Ts, np.float64)[2] @ np.linalg.inv(init[2])
        return float(np.linalg.norm(dT - np.eye(4)))

    # Without the prior the starved frame has zero photometric gradient:
    # it stays 0.5 m off. With it, it is pulled back onto the chain.
    assert frame2_off(p_free) > 0.45, frame2_off(p_free)
    assert frame2_off(p_prior) < 0.02, frame2_off(p_prior)
    # And the prior must NOT stop well-observed frames from converging:
    # frame 3 still gets photometrically corrected toward GT.
    err3_init = np.linalg.norm(init[3] - truth["poses"][3])
    err3 = np.linalg.norm(np.asarray(p_prior)[3] - truth["poses"][3])
    assert err3 < 0.9 * err3_init, (err3_init, err3)
