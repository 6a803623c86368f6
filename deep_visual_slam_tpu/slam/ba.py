"""Windowed photometric bundle adjustment — the native g2o backend, rebuilt
as a fixed-shape batched Levenberg–Marquardt solver in pure JAX.

What it replaces (reference, SURVEY.md §2.5):
  - g2o sparse LM engine: ``g2opy/g2o/core/`` (~13.4k LoC C++ — per-iteration
    linearize -> sparse block Hessian -> LM damping -> CSparse Cholesky),
  - the repo's custom D3VO types: ``VertexD3VOFramePose`` /
    ``VertexD3VOPointDepth`` / ``EdgeProjectD3VO``
    (``g2opy/g2o/types/sba/types_six_dof_expmap.h:347-445``), whose residual
    is the RGB photometric difference
    ``I_dest(cam_map(T_dest · T_host⁻¹ · cam_unmap(uv, d))) - I_host(uv)``
    (``types_six_dof_expmap.cpp:664-697``) with finite-difference image
    gradients in ``linearizeOplus`` (``:702-797``),
  - the pybind11 binding layer (not needed — the solver is jnp end to end).

TPU-native design:
  - FIXED shapes: F keyframes x P points => E = F·P candidate edges, invalid
    edges (host frame, out-of-window, OOB reprojection) masked to weight 0 —
    the reference instead skips edges dynamically (``slam/optimizer.py:276-289``)
    and zeroes OOB errors in C++ (``types_six_dof_expmap.cpp:684-692``).
  - Residuals use *bilinear* image sampling (the C++ casts to int — nearest).
    Jacobians are exact AND closed form: the residual pass carries its full
    edge geometry (reprojected point, relative rotation, bilinear image
    gradient — from the same 4 texels it fetches anyway) across LM
    iterations, and the linearization chains the analytic SE(3) point
    Jacobians ``[I | −[X]ₓ]`` with the pinhole projection Jacobian and that
    carried gradient — zero image gathers, zero autodiff machinery, zero
    geometry recompute (random gathers are the one op class TPUs do badly).
    Window poses are inverted once per frame (closed-form rigid inverse),
    never per edge. The reference's C++ analogue chain rule uses
    finite-difference image gradients
    (``types_six_dof_expmap.cpp:702-797``); ours equals forward-mode
    autodiff through the sampler (pinned by ``tests/test_ba.py``).
  - Gauss-Newton system: dense block Hessian assembled with scatter-adds;
    depth block eliminated by a Schur complement; the reduced (6(F-1))² pose
    system (<= 36x36 for the default 7-keyframe window) is solved with a
    dense Cholesky on the MXU. CSparse is pointless at this size.
  - LM loop: `lax.scan` with adaptive lambda (accept/reject), matching
    g2o's Levenberg strategy (``optimization_algorithm_levenberg.cpp:58``).
    The candidate step is evaluated residual-only (g2o likewise recomputes
    only the error for the candidate, ``:58-120``) and the accepted
    candidate's residuals/weights are carried into the next linearization,
    so each iteration runs ONE jacfwd pass + ONE residual pass. Measured on
    the real chip (TPU v5e, F=7, P=256, 640x480, 6 iters): 0.13 ms/call vs
    0.35 ms for the two-full-linearize variant (2.7x), compile 8.0 s vs 11.3 s.
  - Huber robust kernel (reference ``slam/optimizer.py:287`` RobustKernelHuber)
    via IRLS weights; per-point D3VO uncertainty weights
    ``a² / (a² + unc²)`` (``slam/optimizer.py:276-289``, D3VO Eq. 13).

State conventions:
  - poses: [F, 4, 4] ``T_cw`` (world -> camera), exactly like g2o's
    ``SE3Quat`` estimate in the reference graph.
  - pose update: left-multiplicative ``T <- exp(xi) · T``; depth update
    additive. First pose is gauge-fixed (reference ``slam/optimizer.py:255``).
  - ``host_uv``: [P, 2] (x, y) pixel coords in the host frame.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.ops.se3 import se3_exp, se3_inv, se3_log


class BAProblem(NamedTuple):
    """Fixed-shape windowed BA problem.

    images:   [F, H, W, C] float in [0,1] (C=3 RGB like the reference edge)
    K:        [4, 4] intrinsics
    poses:    [F, 4, 4] initial T_cw per keyframe
    depths:   [P] initial depth of each point in its host frame
    host_uv:  [P, 2] (x, y) pixel location in the host frame
    host_idx: [P] int32 host keyframe index
    obs_mask: [P, F] bool — point p has a residual against frame f
    weight:   [P] per-point D3VO uncertainty weight  a²/(a²+unc²)
    """

    images: jnp.ndarray  # or a tuple of [H, W, C] arrays (stacked in-jit)
    K: jnp.ndarray
    poses: jnp.ndarray
    depths: jnp.ndarray
    host_uv: jnp.ndarray
    host_idx: jnp.ndarray
    obs_mask: jnp.ndarray
    weight: jnp.ndarray


def bilinear_sample(image: jnp.ndarray, uv: jnp.ndarray) -> jnp.ndarray:
    """Sample [H, W, C] at continuous (x, y); clamps to the border."""
    H, W, _ = image.shape
    return bilinear_sample_stack(image[None], jnp.zeros((), jnp.int32), uv)


def bilinear_sample_stack(
    images: jnp.ndarray, frame_idx: jnp.ndarray, uv: jnp.ndarray,
    channel_first: bool = False,
) -> jnp.ndarray:
    """Sample frame ``frame_idx`` of an [F, H, W, C] stack (or [F, C, H, W]
    with ``channel_first=True``) at continuous (x, y) — a 4-texel gather, so
    a vmap over edges stays O(edges), not O(edges x image) (the naive
    per-edge image gather OOMs on TPU).

    Layout note (measured): any f32 array whose MINOR dim is C=3 — the
    [F*H*W, C] flatten, and even a materialized [F, H, W, 3] copy — gets
    TPU tiling T(8,128) with the lane dim padded 3 -> 128 (42.7x HBM;
    20 GB at F=128 full-res in global BA). The samplers therefore flatten
    fully to 1-D (pads nothing) and gather C scalars at static channel
    offsets; global BA additionally stores its stack channel-first so no
    C-minor array ever exists on device.
    """
    if channel_first:
        F, C, H, W = images.shape
    else:
        F, H, W, C = images.shape
    x = jnp.clip(uv[0], 0.0, W - 1.0)
    y = jnp.clip(uv[1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    wx = x - x0
    wy = y - y0
    flat = images.reshape(-1)
    if channel_first:
        base = (frame_idx * C + jnp.arange(C)) * (H * W) + y0 * W + x0
        sx, sy = 1, W
    else:
        base = (frame_idx * (H * W) + y0 * W + x0) * C + jnp.arange(C)
        sx, sy = C, W * C
    v00 = flat[base]
    v01 = flat[base + sx]
    v10 = flat[base + sy]
    v11 = flat[base + sy + sx]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def bilinear_sample_stack_grad(
    images: jnp.ndarray, frame_idx: jnp.ndarray, uv: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Value AND spatial gradient of the bilinear interpolant from ONE
    4-texel fetch: returns ``(I [C], dI/d(x,y) [C, 2])``.

    The gradient is the exact derivative of the piecewise-bilinear surface —
    identical to what reverse/forward-mode autodiff of
    :func:`bilinear_sample_stack` produces (the interpolant is linear in x at
    fixed y and vice versa), but costs zero extra gathers. This is what lets
    the LM loop differentiate ONLY gather-free geometry (see
    :func:`photometric_ba`): the reference's C++ analogue is the
    hand-coded image-gradient chain rule in ``linearizeOplus``
    (``types_six_dof_expmap.cpp:702-797``), which uses *finite-difference*
    image gradients; ours is exact for the interpolant.
    """
    F, H, W, C = images.shape
    x = jnp.clip(uv[0], 0.0, W - 1.0)
    y = jnp.clip(uv[1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    wx = x - x0
    wy = y - y0
    # 1-D flatten + per-channel gathers — see bilinear_sample_stack for why
    # the [F*H*W, C] view is a 42x HBM trap on TPU.
    flat = images.reshape(F * H * W * C)
    base = (frame_idx * (H * W) + y0 * W + x0) * C + jnp.arange(C)
    v00 = flat[base]
    v01 = flat[base + C]
    v10 = flat[base + W * C]
    v11 = flat[base + (W + 1) * C]
    val = (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (
        v10 * (1 - wx) + v11 * wx
    ) * wy
    gx = (v01 - v00) * (1 - wy) + (v11 - v10) * wy
    gy = (v10 - v00) * (1 - wx) + (v11 - v01) * wx
    return val, jnp.stack([gx, gy], axis=-1)


def _unproject(K: jnp.ndarray, uv: jnp.ndarray, depth: jnp.ndarray) -> jnp.ndarray:
    """cam_unmap: pixel + depth -> host-camera-frame 3D point
    (reference ``CameraParameters::cam_unmap``, types_six_dof_expmap.h:79-86)."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    x = (uv[0] - cx) / fx * depth
    y = (uv[1] - cy) / fy * depth
    return jnp.stack([x, y, depth])


def _project(K: jnp.ndarray, X: jnp.ndarray) -> jnp.ndarray:
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    z = jnp.maximum(X[2], 1e-6)
    return jnp.stack([X[0] / z * fx + cx, X[1] / z * fy + cy])


def edge_residual(
    xi_dest: jnp.ndarray,   # [6] se3 perturbation of dest pose
    xi_host: jnp.ndarray,   # [6] se3 perturbation of host pose
    d_depth: jnp.ndarray,   # [] depth perturbation
    T_dest: jnp.ndarray,    # [4, 4] current dest T_cw
    T_host: jnp.ndarray,    # [4, 4] current host T_cw
    depth: jnp.ndarray,     # [] current depth
    uv: jnp.ndarray,        # [2] host pixel
    host_i: jnp.ndarray,    # [] int32 host frame index into images
    dest_i: jnp.ndarray,    # [] int32 dest frame index into images
    images: jnp.ndarray,    # [F, H, W, C] full stack (broadcast, not gathered)
    K: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Photometric residual of one (point, dest-frame) edge + validity.

    r = I_dest(proj(T_dest · T_host⁻¹ · unproj(uv, d))) - I_host(uv),
    evaluated at the retraction exp(xi)·T — differentiating w.r.t.
    (xi_dest, xi_host, d_depth) at zero yields the GN Jacobians.
    """
    Td = se3_exp(xi_dest) @ T_dest
    Th = se3_exp(xi_host) @ T_host
    d = depth + d_depth

    X_host = _unproject(K, uv, d)
    T_rel = Td @ jnp.linalg.inv(Th)
    X_dest = T_rel[:3, :3] @ X_host + T_rel[:3, 3]
    uv_dest = _project(K, X_dest)

    _, H, W, _ = images.shape
    in_bounds = (
        (uv_dest[0] >= 1.0)
        & (uv_dest[0] <= W - 2.0)
        & (uv_dest[1] >= 1.0)
        & (uv_dest[1] <= H - 2.0)
        & (X_dest[2] > 1e-3)
        & (d > 1e-3)
    )
    r = bilinear_sample_stack(images, dest_i, uv_dest) - bilinear_sample_stack(
        images, host_i, uv
    )
    # OOB edges contribute nothing (reference zeroes them,
    # types_six_dof_expmap.cpp:684-692).
    return jnp.where(in_bounds, r, 0.0), in_bounds


def _edge_geometry(xi_d, xi_h, dd, T_dest, T_host, depth, uv, K):
    """Gather-free reprojection geometry of one edge — the ONLY part the
    Jacobian pass needs to differentiate (see :func:`edge_jacobian`).
    Returns (uv_dest [2], dest-frame z, perturbed depth)."""
    Td = se3_exp(xi_d) @ T_dest
    Th = se3_exp(xi_h) @ T_host
    d = depth + dd
    X_host = _unproject(K, uv, d)
    T_rel = Td @ jnp.linalg.inv(Th)
    X_dest = T_rel[:3, :3] @ X_host + T_rel[:3, 3]
    return _project(K, X_dest), X_dest[2], d


def _edge_in_bounds(uv_dest, z, d, H, W):
    return (
        (uv_dest[0] >= 1.0)
        & (uv_dest[0] <= W - 2.0)
        & (uv_dest[1] >= 1.0)
        & (uv_dest[1] <= H - 2.0)
        & (z > 1e-3)
        & (d > 1e-3)
    )


def edge_residual_grad(
    T_dest: jnp.ndarray,   # [4, 4] current dest T_cw
    T_host: jnp.ndarray,   # [4, 4] current host T_cw
    depth: jnp.ndarray,    # [] current depth
    uv: jnp.ndarray,       # [2] host pixel
    I_host: jnp.ndarray,   # [C] prefetched host intensity at uv (constant)
    dest_i: jnp.ndarray,   # [] int32 dest frame index into images
    images: jnp.ndarray,   # [F, H, W, C]
    K: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Residual of one edge at the current point, plus the bilinear image
    gradient gI [C, 2] at the reprojection — free from the texels the
    residual fetches anyway, and exactly what :func:`edge_jacobian` needs to
    linearize at this point. Returns (r [C], in_bounds [], gI [C, 2])."""
    _, H, W, _ = images.shape
    zeros6 = jnp.zeros(6)
    uv_dest, z, d = _edge_geometry(
        zeros6, zeros6, jnp.zeros(()), T_dest, T_host, depth, uv, K
    )
    ok = _edge_in_bounds(uv_dest, z, d, H, W)
    I_dest, gI = bilinear_sample_stack_grad(images, dest_i, uv_dest)
    # OOB edges contribute nothing (reference zeroes them,
    # types_six_dof_expmap.cpp:684-692).
    return jnp.where(ok, I_dest - I_host, 0.0), ok, gI


def edge_jacobian(
    T_dest: jnp.ndarray,
    T_host: jnp.ndarray,
    depth: jnp.ndarray,
    uv: jnp.ndarray,
    gI: jnp.ndarray,       # [C, 2] image gradient at the current reprojection
    images: jnp.ndarray,   # used for H, W only — never gathered
    K: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Exact per-edge Jacobian with ZERO image gathers: forward-mode autodiff
    of the reprojection geometry (13 tangents of pure arithmetic) chained
    with the bilinear image gradient ``gI`` computed by the last accepted
    :func:`edge_residual_grad` pass at the same point. Identical (up to fp
    order) to ``jacfwd`` through the sampler — the residual depends on the
    parameters only through uv_dest, and gI is the interpolant's exact
    derivative there (pinned by ``tests/test_ba.py``).

    Returns (J_dest [C, 6], J_host [C, 6], J_depth [C])."""
    _, H, W, _ = images.shape
    zeros6 = jnp.zeros(6)
    zero = jnp.zeros(())

    def f_uv(xi_d, xi_h, dd):
        return _edge_geometry(
            xi_d, xi_h, dd, T_dest, T_host, depth, uv, K
        )[0]

    uv_dest, z, d = _edge_geometry(
        zeros6, zeros6, zero, T_dest, T_host, depth, uv, K
    )
    ok = _edge_in_bounds(uv_dest, z, d, H, W)
    Ju_d, Ju_h, Ju_z = jax.jacfwd(f_uv, argnums=(0, 1, 2))(
        zeros6, zeros6, zero
    )  # [2, 6], [2, 6], [2]
    J_dest = jnp.where(ok, gI @ Ju_d, 0.0)  # [C, 6]
    J_host = jnp.where(ok, gI @ Ju_h, 0.0)  # [C, 6]
    J_depth = jnp.where(ok, gI @ Ju_z, 0.0)  # [C]
    return J_dest, J_host, J_depth


def _skew(v: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 3, 3] cross-product matrix."""
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    zeros = jnp.zeros_like(x)
    return jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )


def bilinear_sample_many_grad(
    images: jnp.ndarray, frame_idx: jnp.ndarray, uv: jnp.ndarray,
    channel_first: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched :func:`bilinear_sample_stack_grad`: frame_idx [E], uv [E, 2]
    -> (I [E, C], dI/d(x,y) [E, C, 2]). Same 4-texel fetch, expressed as
    batched gathers instead of a vmap of scalar samples. 1-D flatten +
    per-channel gathers — see :func:`bilinear_sample_stack` for the
    C-minor 42x HBM layout trap and the ``channel_first`` contract."""
    if channel_first:
        F, C, H, W = images.shape
    else:
        F, H, W, C = images.shape
    x = jnp.clip(uv[:, 0], 0.0, W - 1.0)
    y = jnp.clip(uv[:, 1], 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    wx = (x - x0)[:, None]
    wy = (y - y0)[:, None]
    flat = images.reshape(-1)
    if channel_first:
        base = ((frame_idx[:, None] * C + jnp.arange(C)) * (H * W)
                + (y0 * W + x0)[:, None])
        sx, sy = 1, W
    else:
        base = ((frame_idx * (H * W) + y0 * W + x0)[:, None] * C
                + jnp.arange(C))
        sx, sy = C, W * C
    v00 = flat[base]
    v01 = flat[base + sx]
    v10 = flat[base + sy]
    v11 = flat[base + sy + sx]
    val = (v00 * (1 - wx) + v01 * wx) * (1 - wy) + (
        v10 * (1 - wx) + v11 * wx
    ) * wy
    gx = (v01 - v00) * (1 - wy) + (v11 - v10) * wy
    gy = (v10 - v00) * (1 - wx) + (v11 - v01) * wx
    return val, jnp.stack([gx, gy], axis=-1)


class EdgeGeometry(NamedTuple):
    """Everything the closed-form linearization needs at the last accepted
    evaluation point — carried across LM iterations so the Jacobian pass
    recomputes NOTHING (no gathers, no reprojection).

    ``gI`` is the image gradient of the (affine-corrected, when a per-frame
    brightness affine is being estimated) dest intensity — i.e. already
    scaled by ``a_dest`` — so the pose/depth chain rule is unchanged.
    ``I_dest`` is the RAW sampled dest intensity: the Jacobian of the
    residual w.r.t. the dest gain is exactly it (dr/da_d = I_dest)."""

    gI: jnp.ndarray      # [E, C, 2] (affine-scaled) image gradient at uv_dest
    R_rel: jnp.ndarray   # [E, 3, 3] dest<-host rotation
    X_h: jnp.ndarray     # [E, 3] point in host camera frame
    X_d: jnp.ndarray     # [E, 3] point in dest camera frame
    ok: jnp.ndarray      # [E] in-bounds / valid-depth mask
    I_dest: jnp.ndarray  # [E, C] raw sampled dest intensity


def edges_evaluate(
    poses: jnp.ndarray,     # [F, 4, 4]
    depths: jnp.ndarray,    # [P]
    e_dest: jnp.ndarray,    # [E] int32
    e_host: jnp.ndarray,    # [E] int32
    e_point: jnp.ndarray,   # [E] int32
    e_dir: jnp.ndarray,     # [E, 3] host unprojection ray (depth-1 point)
    I_host_e: jnp.ndarray,  # [E, C] prefetched host intensities
    images: jnp.ndarray,    # [F, H, W, C] ([F, C, H, W] if channel_first)
    K: jnp.ndarray,
    ab: "jnp.ndarray | None" = None,  # [F, 2] per-frame brightness (a, b)
    channel_first: bool = False,
) -> Tuple[jnp.ndarray, EdgeGeometry]:
    """Batched residual pass at the CURRENT estimate (no retraction — the
    perturbation is identically zero there, so no ``se3_exp`` is evaluated):
    window poses are inverted ONCE per frame (closed form), relative
    transforms come from one [F, F] pair table, and the 4-texel fetch also
    yields the bilinear gradient. Returns (r [E, C], geometry carry).

    ``ab``: per-frame brightness affine variables — the residual becomes
    ``(a_d·I_dest + b_d) − (a_h·I_host + b_h)`` (D3VO's per-frame affine;
    the reference STORES these on its edge, ``optimizer.py:284-285`` /
    ``types_six_dof_expmap.cpp:664-697``, but its runnable path always
    feeds a=1, b=0 — estimating them is the beat-the-reference path)."""
    F = poses.shape[0]
    if channel_first:
        _, _, H, W = images.shape
    else:
        _, H, W, _ = images.shape
    inv_poses = se3_inv(poses)
    T_pair = jnp.einsum("aij,bjk->abik", poses, inv_poses)  # [F, F, 4, 4]
    T_rel = T_pair[e_dest, e_host]  # [E, 4, 4]
    R_rel = T_rel[:, :3, :3]

    d = depths[e_point]
    X_h = e_dir * d[:, None]
    X_d = jnp.einsum("eij,ej->ei", R_rel, X_h) + T_rel[:, :3, 3]
    z = jnp.maximum(X_d[:, 2], 1e-6)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    uv_dest = jnp.stack(
        [X_d[:, 0] / z * fx + cx, X_d[:, 1] / z * fy + cy], axis=-1
    )
    ok = (
        (uv_dest[:, 0] >= 1.0)
        & (uv_dest[:, 0] <= W - 2.0)
        & (uv_dest[:, 1] >= 1.0)
        & (uv_dest[:, 1] <= H - 2.0)
        & (X_d[:, 2] > 1e-3)
        & (d > 1e-3)
    )
    I_dest, gI = bilinear_sample_many_grad(
        images, e_dest, uv_dest, channel_first=channel_first
    )
    if ab is None:
        diff = I_dest - I_host_e
    else:
        a_d = ab[e_dest, 0][:, None]
        b_d = ab[e_dest, 1][:, None]
        a_h = ab[e_host, 0][:, None]
        b_h = ab[e_host, 1][:, None]
        diff = (a_d * I_dest + b_d) - (a_h * I_host_e + b_h)
        gI = gI * a_d[..., None]  # chain rule: d(a_d·I)/duv = a_d·gI
    r = jnp.where(ok[:, None], diff, 0.0)
    return r, EdgeGeometry(gI, R_rel, X_h, X_d, ok, I_dest)


def edges_jacobian(
    geom: EdgeGeometry, e_dir: jnp.ndarray, K: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Closed-form GN Jacobians of every edge at the carried geometry —
    ZERO image access, ZERO reprojection recompute, ZERO autodiff machinery.

    With the left-multiplicative retraction ``T <- exp(xi)·T`` and
    ``xi = [rho, phi]`` (``ops/se3.py``), the standard SE(3) point Jacobians
    are ``dX_d/dxi_dest = [I | −[X_d]ₓ]`` and
    ``dX_d/dxi_host = −R_rel·[I | −[X_h]ₓ]``; the pinhole projection adds
    ``J_pi = [[fx/z, 0, −fx·x/z²], [0, fy/z, −fy·y/z²]]``. Chained with the
    carried bilinear gradient gI this equals forward-mode autodiff through
    the sampler (pinned against the jacfwd oracle by ``tests/test_ba.py::
    test_closed_form_jacobian_matches_autodiff``); the reference's C++
    analogue is ``linearizeOplus`` (``types_six_dof_expmap.cpp:702-797``)
    with finite-difference image gradients.

    Returns (J_dest [E, C, 6], J_host [E, C, 6], J_depth [E, C])."""
    gI, R_rel, X_h, X_d, ok = (
        geom.gI, geom.R_rel, geom.X_h, geom.X_d, geom.ok
    )
    fx, fy = K[0, 0], K[1, 1]
    z = jnp.maximum(X_d[:, 2], 1e-6)
    iz = 1.0 / z
    # J_pi [E, 2, 3]: projection Jacobian at X_d.
    zeros = jnp.zeros_like(z)
    Jpi = jnp.stack(
        [
            jnp.stack([fx * iz, zeros, -fx * X_d[:, 0] * iz * iz], axis=-1),
            jnp.stack([zeros, fy * iz, -fy * X_d[:, 1] * iz * iz], axis=-1),
        ],
        axis=-2,
    )
    # uv_dest w.r.t. dest pose: J_pi · [I | −[X_d]ₓ]  ->  [E, 2, 6]
    Ju_d = jnp.concatenate(
        [Jpi, -jnp.einsum("eij,ejk->eik", Jpi, _skew(X_d))], axis=-1
    )
    # w.r.t. host pose: −J_pi·R_rel · [I | −[X_h]ₓ]
    JpiR = jnp.einsum("eij,ejk->eik", Jpi, R_rel)  # [E, 2, 3]
    Ju_h = jnp.concatenate(
        [-JpiR, jnp.einsum("eij,ejk->eik", JpiR, _skew(X_h))], axis=-1
    )
    # w.r.t. depth: J_pi·R_rel·dir  ->  [E, 2]
    Ju_z = jnp.einsum("eij,ej->ei", JpiR, e_dir)

    okf = ok[:, None, None].astype(gI.dtype)
    J_dest = okf * jnp.einsum("eci,eij->ecj", gI, Ju_d)
    J_host = okf * jnp.einsum("eci,eij->ecj", gI, Ju_h)
    J_depth = okf[..., 0] * jnp.einsum("eci,ei->ec", gI, Ju_z)
    return J_dest, J_host, J_depth


def se3_adjoint(T: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of SE(3) for the ``xi = [rho, phi]`` convention:
    ``T·exp(xi)·T⁻¹ = exp(Ad_T·xi)`` with ``Ad_T = [[R, [t]ₓR], [0, R]]``
    ([..., 4, 4] -> [..., 6, 6])."""
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    txR = _skew(t) @ R
    top = jnp.concatenate([R, txR], axis=-1)
    bot = jnp.concatenate([jnp.zeros_like(R), R], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def huber_weight(r_norm: jnp.ndarray, delta: float) -> jnp.ndarray:
    """IRLS weight of the Huber kernel: 1 inside delta, delta/|r| outside."""
    return jnp.where(r_norm <= delta, 1.0, delta / jnp.maximum(r_norm, 1e-12))


@partial(
    jax.jit, static_argnames=("num_iters", "fix_first", "estimate_affine")
)
def photometric_ba(
    problem: BAProblem,
    num_iters: int = 6,
    huber_delta: float = 0.11,
    init_lambda: float = 1e-4,
    fix_first: bool = True,
    depth_damping: float = 0.0,
    prior_weight: float = 0.0,
    prior_rel: jnp.ndarray | None = None,
    num_real: jnp.ndarray | None = None,
    prior_anchor: jnp.ndarray | None = None,
    estimate_affine: bool = False,
    init_ab: jnp.ndarray | None = None,
    affine_prior: float = 10.0,
):
    """Run LM over the window; returns (poses, depths, diagnostics).

    Diagnostics: ``chi2`` is the TOTAL accepted energy
    (``chi2_photo + chi2_prior``); the two terms are also returned
    separately so logged values stay comparable across ``prior_weight``
    settings (the prior term scales with ``w`` up to 1e3 per edge).
    ``chi2_history`` tracks the total.

    ``prior_anchor``: pose chain whose consecutive relative poses pin the
    odometry prior when ``prior_rel`` is None (defaults to the problem's
    own init poses). Passing it keeps the derivation INSIDE the jit — the
    pyramid / staged global BA use it to anchor every level/stage at the
    ORIGINAL chain with zero eager device dispatches.

    num_iters matches the reference's windowed call ``opt.optimize(6)``
    (``slam/optimizer.py:222,292-294``); pass 20 for the global-BA variant
    (``slam/optimizer.py:99-220``).

    ``prior_weight`` / ``prior_rel`` / ``num_real``: odometry relative-pose
    prior between consecutive window frames — the D3VO formulation (the
    network pose is an edge in the graph, not just the init; D3VO Eq. 15).
    Residual ``r_i = log(T_{i+1}·T_i⁻¹·T̂_rel_i⁻¹)`` with first-order
    Jacobians ``J_{i+1} = I``, ``J_i = −Ad(T_rel)``, weighted
    ``prior_weight`` per unit (m / rad). ``prior_rel`` defaults to the
    relative poses OF THE INIT (the odometry chain the SLAM driver
    composed); ``num_real`` masks prior edges into padded frame slots.
    Why it exists (measured, window 9 of the r03 oracle ablation): a
    window frame observed by few photometric edges is near-unconstrained,
    and once LM's lambda decays (1e-6 after an acceptance streak) a
    texture-aliased step of 1.5 m / 32° on that frame gets ACCEPTED
    because chi2 drops 6.86 -> 5.24. The prior makes that step cost
    ``w·||log||² ~ w·2.25`` — rejected at any sane weight — while healthy
    corrections (~1e-2) cost ~1e-4·w, i.e. nothing. Photometric evidence
    still dominates wherever it exists.

    ``depth_damping``: absolute floor added to the depth Hessian diagonal
    inside the solve — pure step damping, NOT an energy term (an energy
    prior anchored at the init breaks the monocular scale gauge: measured
    huber-outlier pose diff 4e-2 at ANY nonzero prior weight vs 6e-4
    without). The solver default stays 0 (pure LM, the g2o semantics);
    the SLAM driver (``slam/map.py``) passes 1.0, and that choice is
    measured, not aesthetic: at a 7-frame window with ~0.12 m total
    baseline on 2–3 m geometry, per-point depth is photometrically
    identifiable only to ~d²/(f·b) ≈ 0.3 m/px, and near-periodic texture
    aliases whole periods — so with FREE depths LM walks a GT depth init
    1.3 m off (59% of points >0.5 m) while chi2 falls, and pose error gets
    WORSE than the odometry init (0.027 → 0.030). A floor of 1 keeps
    weakly observable points (H_dd ~ eps²) effectively frozen while
    strongly observable ones (H_dd ~ 10²–10³) move freely: pose error
    0.027 → 0.009, and it stays best even when the depth init carries 15%
    noise (err 0.0094 vs 0.030 at floor 0). The escape-proof acceptance
    below closes the leave-the-image exploit but NOT texture aliasing —
    damping is what makes BA *improve* trajectories (measured in
    ``docs/ba_ablation_r03.json``).

    ``estimate_affine``: per-frame brightness affine (gain a, bias b) as BA
    VARIABLES — the frame block grows 6 -> 8 and the residual becomes
    ``(a_d·I_d + b_d) − (a_h·I_h + b_h)``. This is the D3VO formulation the
    reference's C++ edge stores but its runnable driver never exercises
    (``slam/MonoVO.py:19-27`` feeds a=1, b=0; ``optimizer.py:284-285``).
    ``init_ab`` [F, 2] seeds (a, b) (default identity); ``affine_prior``
    is a quadratic anchor ``w·((a−1)² + b²)`` per frame — (a, b) share a
    gauge with the depth/intensity scale, so absent exposure evidence they
    must stay at identity. Estimated values are returned in ``diag["ab"]``.
    """
    F = problem.poses.shape[0]
    P = problem.depths.shape[0]
    K = problem.K
    images = problem.images
    # The SLAM driver passes the window as a TUPLE of per-frame device
    # images: stacking here (inside the jit trace) replaces the eager
    # per-keyframe jnp.stack of a 25 MB window — F+1 eager device
    # dispatches per solve, the dominant measured host cost of BA problem
    # assembly (docs/bench_slam_r03.json ba_build bucket).
    if isinstance(images, (tuple, list)):
        images = jnp.stack(images)
    if images.dtype == jnp.uint8:
        # uint8 device-image cache (the low-H2D SLAM ingest): photometric
        # units are [0,1] (huber_delta 0.11), so scale inside the jit.
        images = images.astype(jnp.float32) / 255.0

    # Edge list: every (point, dest frame) pair, masked.
    dest_idx = jnp.tile(jnp.arange(F)[None, :], (P, 1))  # [P, F]
    point_idx = jnp.tile(jnp.arange(P)[:, None], (1, F))  # [P, F]
    edge_mask = problem.obs_mask & (dest_idx != problem.host_idx[:, None])

    e_point = point_idx.reshape(-1)  # [E]
    e_dest = dest_idx.reshape(-1)
    e_mask = edge_mask.reshape(-1)
    e_host = problem.host_idx[e_point]
    e_weight = problem.weight[e_point]

    e_uv = problem.host_uv[e_point]
    # Host unprojection rays are constant: precompute once per solve.
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    e_dir = jnp.stack(
        [
            (e_uv[:, 0] - cx) / fx,
            (e_uv[:, 1] - cy) / fy,
            jnp.ones_like(e_uv[:, 0]),
        ],
        axis=-1,
    )  # [E, 3]

    # Host intensities never move (the host pixel is a constant): ONE fetch
    # for the whole optimization instead of one per evaluation pass.
    I_host_e = jax.vmap(
        lambda hi, uv: bilinear_sample_stack(images, hi, uv)
    )(e_host, e_uv)  # [E, C]

    # Odometry relative-pose prior (see docstring). Anchored at the INIT's
    # relative poses unless the caller pins its own (the pyramid pins the
    # original, pre-coarse-level chain).
    if prior_rel is None:
        anchor = problem.poses if prior_anchor is None else prior_anchor
        prior_rel = anchor[1:] @ se3_inv(anchor[:-1])
    prior_inv = se3_inv(prior_rel)  # [F-1, 4, 4]
    if num_real is None:
        p_mask = jnp.ones(F - 1, jnp.float32)
    else:
        p_mask = ((jnp.arange(F - 1) + 1) < num_real).astype(jnp.float32)
    pw = jnp.asarray(prior_weight, jnp.float32) * p_mask  # [F-1]

    # Per-frame brightness affine state (estimate_affine only; constant
    # identity otherwise — carried regardless so the scan carry is uniform).
    if init_ab is None:
        ab0 = jnp.tile(jnp.array([1.0, 0.0], jnp.float32), (F, 1))
    else:
        ab0 = jnp.asarray(init_ab, jnp.float32)
    w_ab = jnp.asarray(affine_prior, jnp.float32)
    ab_anchor = jnp.tile(jnp.array([1.0, 0.0], jnp.float32), (F, 1))

    def prior_eval(poses, ab):
        """Prior residuals, current relative poses, and prior cost (the
        odometry chain + the affine anchor when estimating (a, b))."""
        T_rel = poses[1:] @ se3_inv(poses[:-1])
        r = se3_log(T_rel @ prior_inv)  # [F-1, 6]
        cost = jnp.sum(pw * jnp.sum(r * r, axis=-1))
        if estimate_affine:
            cost = cost + w_ab * jnp.sum((ab - ab_anchor) ** 2)
        return r, T_rel, cost

    def evaluate(poses, depths, ab):
        """Residual pass: r, IRLS weights, cost, and the full edge geometry
        at this point — exactly what the next linearization here needs
        (g2o likewise only recomputes the error for the LM candidate,
        ``optimization_algorithm_levenberg.cpp:58-120``).
        """
        r, geom = edges_evaluate(
            poses, depths, e_dest, e_host, e_point, e_dir, I_host_e,
            images, K, ab=ab if estimate_affine else None,
        )
        r_norm = jnp.linalg.norm(r, axis=-1)
        w = (
            huber_weight(r_norm, huber_delta)
            * e_weight
            * e_mask.astype(jnp.float32)
            * geom.ok.astype(jnp.float32)
        )
        chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))
        return r, w, chi2, geom

    def linearize_jac(geom):
        """Closed-form Jacobians at the carried geometry — pure arithmetic,
        no image access, no reprojection recompute (see
        :func:`edges_jacobian`)."""
        return edges_jacobian(geom, e_dir, K)

    # One-hot edge->slot placement matrices, built once per solve. Scatter-add
    # with duplicate indices (the obvious `.at[e_dest, e_host].add(block)`)
    # serializes on TPU; expressed as einsums against these, the whole normal-
    # equation assembly becomes a handful of small matmuls on the MXU.
    onehot_d = (e_dest[:, None] == jnp.arange(F)[None, :]).astype(jnp.float32)
    onehot_h = (e_host[:, None] == jnp.arange(F)[None, :]).astype(jnp.float32)
    onehot_p = (e_point[:, None] == jnp.arange(P)[None, :]).astype(jnp.float32)

    # Frame-variable dimension: 6 (pose) or 8 (pose + brightness gain/bias).
    D = 8 if estimate_affine else 6

    def build_system(r, w, J_dest, J_host, J_depth, r_prior, T_rel,
                     geom, ab):
        """Assemble the damped GN system via one-hot matmuls (zero scatters).

        Each edge touches two frame slots (dest, host); placing both into a
        window-wide jacobian J_full [E, C, F, D] (0.9 MB at E=1792, D=6)
        turns every Hessian/gradient block into a dense contraction:
        H_pp = (wJ)ᵀJ over the [E·C] axis — one [FD, EC]x[EC, FD] matmul.
        With ``estimate_affine`` the two extra columns per frame are the
        closed-form affine derivatives (dr/da_d = I_dest, dr/db_d = 1,
        dr/da_h = −I_host, dr/db_h = −1), masked like the rest.
        """
        if estimate_affine:
            okf = geom.ok[:, None].astype(r.dtype)
            ones = okf * jnp.ones_like(geom.I_dest)
            J_dest = jnp.concatenate(
                [J_dest, (okf * geom.I_dest)[..., None], ones[..., None]],
                axis=-1,
            )
            J_host = jnp.concatenate(
                [J_host, (-okf * I_host_e)[..., None], -ones[..., None]],
                axis=-1,
            )
        # r: [E, C]; J_*: [E, C, D]; J_depth: [E, C]
        J_full = (
            onehot_d[:, None, :, None] * J_dest[:, :, None, :]
            + onehot_h[:, None, :, None] * J_host[:, :, None, :]
        )  # [E, C, F, D]
        wJ_full = J_full * w[:, None, None, None]
        wJz = J_depth * w[:, None]

        EC = J_full.shape[0] * J_full.shape[1]
        A = J_full.reshape(EC, F * D)
        wA = wJ_full.reshape(EC, F * D)
        H_pp = (wA.T @ A).reshape(F, D, F, D).transpose(0, 2, 1, 3)

        # Pose-depth coupling [P, F, D]: per-edge sum over channels, then
        # a [P, E]x[E, FD] matmul to place each edge at its host point.
        pd_edge = jnp.einsum("ecfi,ec->efi", J_full, wJz).reshape(-1, F * D)
        H_pd = (onehot_p.T @ pd_edge).reshape(P, F, D)

        # Depth diagonal [P] and gradients.
        H_dd = onehot_p.T @ jnp.einsum("ec,ec->e", wJz, J_depth)
        b_p = -jnp.einsum("ecfi,ec->fi", wJ_full, r)
        b_d = -(onehot_p.T @ jnp.einsum("ec,ec->e", wJz, r))

        # Odometry-prior blocks (J_{i+1} = I, J_i = −Ad(T_rel); F-1 edges,
        # each frame index touched once per .at group — no duplicate-index
        # scatters). With D=8 the pose prior lives in the first 6 coords.
        Ad = se3_adjoint(T_rel)                      # [F-1, 6, 6]
        AdTAd = jnp.einsum("fki,fkj->fij", Ad, Ad)   # AdᵀAd
        AdTr = jnp.einsum("fji,fj->fi", Ad, r_prior)  # Adᵀ r
        idx = jnp.arange(F - 1)
        pwb = pw[:, None, None]

        def embed(block66):
            """[.., 6, 6] -> [.., D, D] (zero affine rows/cols)."""
            if D == 6:
                return block66
            out = jnp.zeros(block66.shape[:-2] + (D, D), block66.dtype)
            return out.at[..., :6, :6].set(block66)

        eyeD6 = embed(jnp.broadcast_to(jnp.eye(6), (F - 1, 6, 6)))
        AdD = embed(Ad)
        H_pp = H_pp.at[idx, idx].add(pwb * embed(AdTAd))
        H_pp = H_pp.at[idx + 1, idx + 1].add(pwb * eyeD6)
        H_pp = H_pp.at[idx + 1, idx].add(-pwb * AdD)
        H_pp = H_pp.at[idx, idx + 1].add(
            -pwb * jnp.swapaxes(AdD, -1, -2)
        )
        if D == 6:
            b_p = b_p.at[idx + 1].add(-pw[:, None] * r_prior)
            b_p = b_p.at[idx].add(pw[:, None] * AdTr)
        else:
            b_p = b_p.at[idx + 1, :6].add(-pw[:, None] * r_prior)
            b_p = b_p.at[idx, :6].add(pw[:, None] * AdTr)
            # Affine anchor: quadratic pull of every (a, b) to (1, 0) —
            # removes the affine gauge where no exposure evidence exists.
            diag = jnp.arange(F)
            H_pp = H_pp.at[diag, diag, 6, 6].add(w_ab)
            H_pp = H_pp.at[diag, diag, 7, 7].add(w_ab)
            b_p = b_p.at[:, 6:8].add(-w_ab * (ab - ab_anchor))

        return H_pp, H_pd, H_dd, b_p, b_d

    def solve(H_pp, H_pd, H_dd, b_p, b_d, lam):
        # LM damping (g2o Levenberg adds lambda to the diagonal) plus the
        # absolute depth floor (see ``depth_damping`` in the docstring).
        eyeD = jnp.eye(D)
        H_pp = H_pp + lam * eyeD[None, None] * jnp.eye(F)[:, :, None, None]
        H_dd_d = H_dd + lam + depth_damping + 1e-10

        # Schur complement onto poses.
        A = H_pd.reshape(P, F * D)  # = H_dp^T rows
        Ainv = A / H_dd_d[:, None]
        H_full = H_pp.transpose(0, 2, 1, 3).reshape(F * D, F * D)
        H_sc = H_full - A.T @ Ainv
        b_sc = b_p.reshape(F * D) - Ainv.T @ b_d

        if fix_first:
            H_red = H_sc[D:, D:]
            b_red = b_sc[D:]
        else:
            H_red = H_sc
            b_red = b_sc
        # Dense Cholesky on the tiny reduced system.
        L = jnp.linalg.cholesky(
            H_red + 1e-8 * jnp.eye(H_red.shape[0])
        )
        dx_red = jax.scipy.linalg.cho_solve((L, True), b_red)
        dx_pose = (
            jnp.concatenate([jnp.zeros(D), dx_red]) if fix_first else dx_red
        )

        # Back-substitute depths: dz = D^-1 (b_d - H_dp dx_pose).
        dz = (b_d - A @ dx_pose) / H_dd_d
        return dx_pose.reshape(F, D), dz

    def retract(poses, depths, ab, dx, dz):
        new_poses = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(
            dx[:, :6], poses
        )
        new_ab = ab + dx[:, 6:8] if estimate_affine else ab
        return new_poses, depths + dz, new_ab

    def lm_step(carry, _):
        poses, depths, ab, lam, r, w, chi2_photo, chi2_prior, geom = carry
        # One closed-form Jacobian pass at the carried geometry; (r, w,
        # geom, chi2_*) come from the last accepted evaluation of this
        # point. Acceptance compares TOTAL energy (photometric + prior);
        # the two terms are carried separately for the diagnostics.
        chi2 = chi2_photo + chi2_prior
        Jd, Jh, Jz = linearize_jac(geom)
        r_pr, T_rel, _ = prior_eval(poses, ab)
        H_pp, H_pd, H_dd, b_p, b_d = build_system(
            r, w, Jd, Jh, Jz, r_pr, T_rel, geom, ab
        )
        dx_pose, dz = solve(H_pp, H_pd, H_dd, b_p, b_d, lam)
        cand_poses, cand_depths, cand_ab = retract(
            poses, depths, ab, dx_pose, dz
        )

        # Residual-only candidate cost; a diverged (non-finite) candidate
        # must be rejected even though masking could zero its residuals.
        r2, w2, chi2_new, geom2 = evaluate(cand_poses, cand_depths, cand_ab)
        _, _, prior_new = prior_eval(cand_poses, cand_ab)
        # Escape-proof acceptance: a photometric edge that LEAVES validity
        # (reprojects out of bounds / depth goes non-positive) keeps its
        # PREVIOUS cost in the comparison. Otherwise LM can "improve" chi2
        # by pushing a pose until its points fall off the image — the OOB
        # zeroing that is correct for the residual (reference zeroes too,
        # types_six_dof_expmap.cpp:684-692) is an exploit if it also zeroes
        # the acceptance test (measured: oracle-init windows walked away
        # from GT through exactly this channel). Prior edges can't escape —
        # they enter both sides directly.
        c_old = w * jnp.sum(r * r, axis=-1)
        c_new = w2 * jnp.sum(r2 * r2, axis=-1)
        escaped = geom.ok & ~geom2.ok
        chi2_cmp = jnp.sum(jnp.where(escaped, c_old, c_new)) + prior_new
        finite = (
            jnp.isfinite(chi2_cmp)
            & jnp.all(jnp.isfinite(cand_poses))
            & jnp.all(jnp.isfinite(cand_depths))
        )
        chi2_cmp = jnp.where(finite, chi2_cmp, jnp.inf)
        accept = chi2_cmp < chi2

        new_poses = jnp.where(accept, cand_poses, poses)
        new_depths = jnp.where(accept, cand_depths, depths)
        new_ab = jnp.where(accept, cand_ab, ab)
        new_r = jnp.where(accept, r2, r)
        new_w = jnp.where(accept, w2, w)
        new_geom = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), geom2, geom
        )
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        # Carry the ACTUAL energies of the accepted state (escaped edges
        # are genuinely gone from the photometric term after acceptance).
        new_photo = jnp.where(accept, chi2_new, chi2_photo)
        new_prior = jnp.where(accept, prior_new, chi2_prior)
        return (
            new_poses, new_depths, new_ab, lam, new_r, new_w, new_photo,
            new_prior, new_geom
        ), chi2

    r0, w0, chi2_0, geom0 = evaluate(problem.poses, problem.depths, ab0)
    _, _, prior_0 = prior_eval(problem.poses, ab0)
    (
        poses, depths, ab, lam, _, _, c_photo, c_prior, _
    ), chi2_hist = jax.lax.scan(
        lm_step,
        (
            problem.poses, problem.depths, ab0, jnp.asarray(init_lambda),
            r0, w0, chi2_0, prior_0, geom0,
        ),
        None,
        length=num_iters,
    )
    return poses, depths, {
        "chi2": c_photo + c_prior, "chi2_photo": c_photo,
        "chi2_prior": c_prior, "chi2_history": chi2_hist, "lambda": lam,
        "ab": ab,
    }


@partial(
    jax.jit,
    static_argnames=("scale", "num_iters", "fix_first", "estimate_affine"),
)
def photometric_ba_scaled(
    problem: BAProblem,
    scale: int = 1,
    num_iters: int = 6,
    huber_delta: float = 0.11,
    init_lambda: float = 1e-4,
    fix_first: bool = True,
    depth_damping: float = 0.0,
    prior_weight: float = 0.0,
    prior_rel: "jnp.ndarray | None" = None,
    num_real: "jnp.ndarray | None" = None,
    prior_anchor: "jnp.ndarray | None" = None,
    estimate_affine: bool = False,
    init_ab: "jnp.ndarray | None" = None,
    affine_prior: float = 10.0,
):
    """:func:`photometric_ba` on a ``scale``-times-downsampled problem.

    Images are average-pooled (exact s x s box filter — one reshape-mean,
    no gathers), intrinsics and host pixels follow the pixel-CENTER
    convention ``x' = (x + 0.5)/s − 0.5``, and the whole
    downsample-plus-solve is ONE jitted program (one device dispatch —
    matters at ~100 ms RPC per dispatch over a tunnelled chip). Depth,
    poses and the photometric Huber threshold are scale-invariant.
    """
    if scale == 1:
        return photometric_ba(
            problem, num_iters=num_iters, huber_delta=huber_delta,
            init_lambda=init_lambda, fix_first=fix_first,
            depth_damping=depth_damping, prior_weight=prior_weight,
            prior_rel=prior_rel, num_real=num_real,
            prior_anchor=prior_anchor, estimate_affine=estimate_affine,
            init_ab=init_ab, affine_prior=affine_prior,
        )
    full = problem.images
    if isinstance(full, (tuple, list)):  # see photometric_ba
        full = jnp.stack(full)
    if full.dtype == jnp.uint8:  # uint8 ingest: scale BEFORE the box pool
        full = full.astype(jnp.float32) / 255.0
    problem = problem._replace(images=full)
    F, H, W, C = full.shape
    s = scale
    images = full[:, : (H // s) * s, : (W // s) * s].reshape(
        F, H // s, s, W // s, s, C
    ).mean(axis=(2, 4))
    K = problem.K
    K_s = K.at[0, 0].set(K[0, 0] / s)
    K_s = K_s.at[1, 1].set(K[1, 1] / s)
    K_s = K_s.at[0, 2].set((K[0, 2] + 0.5) / s - 0.5)
    K_s = K_s.at[1, 2].set((K[1, 2] + 0.5) / s - 0.5)
    scaled = problem._replace(
        images=images, K=K_s, host_uv=(problem.host_uv + 0.5) / s - 0.5
    )
    # The prior lives in metric/angle units — scale-invariant, untouched
    # (the brightness affine likewise: intensities are [0,1] at all scales).
    return photometric_ba(
        scaled, num_iters=num_iters, huber_delta=huber_delta,
        init_lambda=init_lambda, fix_first=fix_first,
        depth_damping=depth_damping, prior_weight=prior_weight,
        prior_rel=prior_rel, num_real=num_real,
        prior_anchor=prior_anchor, estimate_affine=estimate_affine,
        init_ab=init_ab, affine_prior=affine_prior,
    )


def photometric_ba_pyramid(
    problem: BAProblem,
    levels: Tuple[int, ...] = (4, 2, 1),
    iters_per_level: Tuple[int, ...] = (4, 4, 6),
    huber_delta: float = 0.11,
    fix_first: bool = True,
    depth_damping: float = 0.0,
    prior_weight: float = 0.0,
    num_real: "jnp.ndarray | None" = None,
    prior_anchor: "jnp.ndarray | None" = None,
    estimate_affine: bool = False,
    affine_prior: float = 10.0,
):
    """Coarse-to-fine LM: solve at each pyramid level (coarsest first),
    carrying (poses, depths) down — the classical direct-method answer to
    the single-scale basin problem (DSO-style; the bilinear linearization
    is only valid within ~1 px at each level, so the 4x level converges
    from ~4x larger initial flow). One device dispatch per level.

    The reference has no analogue — its g2o graph is single-scale because
    its networks are trained, so the init is already inside the basin; this
    wrapper is what lets the SAME backend also converge from weak inits.
    """
    poses, depths = problem.poses, problem.depths
    # Pin the prior at the ORIGINAL odometry chain: a coarse level must not
    # re-anchor the finer levels at its own (partially converged) output.
    # The chain is derived from ``anchor`` INSIDE each level's jit (not
    # eagerly here — an eager jnp matmul + se3_inv would cost 1-2 device
    # dispatches per solve, ~100-200 ms over a tunnelled chip).
    anchor = problem.poses if prior_anchor is None else prior_anchor
    diag = None
    ab = None  # estimated (a, b) carried coarse -> fine like poses/depths
    for s, it in zip(levels, iters_per_level):
        problem = problem._replace(poses=poses, depths=depths)
        poses, depths, diag = photometric_ba_scaled(
            problem, scale=int(s), num_iters=int(it),
            huber_delta=huber_delta, fix_first=fix_first,
            depth_damping=depth_damping, prior_weight=prior_weight,
            num_real=num_real, prior_anchor=anchor,
            estimate_affine=estimate_affine, init_ab=ab,
            affine_prior=affine_prior,
        )
        if estimate_affine:
            ab = diag["ab"]
    return poses, depths, diag
