"""Device-side sparse feature tracking: pyramidal Lucas-Kanade + Shi-Tomasi.

Why this exists: the reference's SLAM frontend runs serial OpenCV ORB +
BFMatcher on the host per frame (``/root/reference/slam/frontend.py:22-67``)
— ~100 ms ORB + ~71 ms KNN per 640x480 frame on a 1-core host, which caps
the full SLAM loop far below the 60 FPS target no matter how fast the
networks are. The backend here is *photometric* BA (D3VO-style,
``slam/ba.py``), which needs well-localized high-gradient points tracked
across keyframes — not binary descriptors. So the TPU-native frontend is a
KLT tracker: Shi-Tomasi corners detected on device, tracked frame-to-frame
with pyramidal Lucas-Kanade, all in plain jnp so XLA fuses it into the same
dispatch as the depth/pose networks (one device round-trip per frame).

This is closer to the direct-sparse-odometry frontend D3VO itself builds on
than ORB matching is; the ORB/Lowe path is kept in ``slam/frontend.py`` for
reference parity and as an alternative ``MonoVO(frontend="orb")`` mode.

Everything is fixed-shape: P point slots, L pyramid levels, (2w+1)^2 patch
— one compiled program for the whole sequence. Gathers are 4-texel bilinear
taps over [P, K] index arrays (the same scheme as ``slam/ba.py``'s
``bilinear_sample_stack``), which XLA lowers well; a Pallas variant was not
attempted because the op is gather-bound, not FLOP-bound (see
``ops/pallas/photometric_pallas.py`` for the measured XLA-vs-Pallas stencil
comparison on this class of op).
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

# Luma weights (ITU-R BT.601), same convention as cv2.cvtColor RGB2GRAY.
_LUMA = jnp.asarray([0.299, 0.587, 0.114])


def rgb_to_gray(image: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] float RGB -> [..., H, W] float gray."""
    return image @ _LUMA


def _smooth121(gray: jnp.ndarray) -> jnp.ndarray:
    """Separable [1, 2, 1]/4 low-pass (edge-replicated) — anti-alias before
    pyramid subsampling."""

    def ax(x, axis):
        lo = jnp.take(x, jnp.asarray([0]), axis=axis)
        hi = jnp.take(x, jnp.asarray([x.shape[axis] - 1]), axis=axis)
        pad = jnp.concatenate([lo, x, hi], axis=axis)
        n = x.shape[axis]
        a = jax.lax.slice_in_dim(pad, 0, n, axis=axis)
        b = jax.lax.slice_in_dim(pad, 1, n + 1, axis=axis)
        c = jax.lax.slice_in_dim(pad, 2, n + 2, axis=axis)
        return 0.25 * a + 0.5 * b + 0.25 * c

    return ax(ax(gray, -2), -1)


def build_pyramid(gray: jnp.ndarray, levels: int) -> List[jnp.ndarray]:
    """Gray [H, W] -> list of ``levels`` images, level l is H/2^l x W/2^l
    (floor), each produced by smooth + 2x subsample."""
    pyr = [gray]
    for _ in range(levels - 1):
        s = _smooth121(pyr[-1])
        pyr.append(s[::2, ::2])
    return pyr


def _bilinear_gather(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Sample [H, W] at float (x, y) arrays of any matching shape; border
    clamp. 4-texel flat gather."""
    H, W = img.shape
    x = jnp.clip(x, 0.0, W - 1.0)
    y = jnp.clip(y, 0.0, H - 1.0)
    x0 = jnp.clip(jnp.floor(x), 0, W - 2).astype(jnp.int32)
    y0 = jnp.clip(jnp.floor(y), 0, H - 2).astype(jnp.int32)
    wx = x - x0
    wy = y - y0
    flat = img.reshape(-1)
    base = y0 * W + x0
    v00 = flat[base]
    v01 = flat[base + 1]
    v10 = flat[base + W]
    v11 = flat[base + W + 1]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def _patch_offsets(win: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Flattened (2w+1)^2 patch offsets as ([K], [K]) float arrays."""
    r = jnp.arange(-win, win + 1, dtype=jnp.float32)
    ox, oy = jnp.meshgrid(r, r, indexing="xy")
    return ox.reshape(-1), oy.reshape(-1)


def _track_level(
    prev: jnp.ndarray,
    cur: jnp.ndarray,
    pts: jnp.ndarray,     # [P, 2] point positions at THIS level, in prev
    d: jnp.ndarray,       # [P, 2] current flow estimate at this level
    win: int,
    iters: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One pyramid level of inverse-style LK. Returns (flow, mean |residual|,
    structure-tensor min-eig proxy det)."""
    ox, oy = _patch_offsets(win)                      # [K]
    px = pts[:, 0:1] + ox[None]                       # [P, K]
    py = pts[:, 1:2] + oy[None]

    # Template + its gradients from the PREV image (inverse compositional:
    # G is constant over the iterations).
    T = _bilinear_gather(prev, px, py)
    Ix = 0.5 * (_bilinear_gather(prev, px + 1, py) - _bilinear_gather(prev, px - 1, py))
    Iy = 0.5 * (_bilinear_gather(prev, px, py + 1) - _bilinear_gather(prev, px, py - 1))

    Gxx = jnp.sum(Ix * Ix, axis=1)
    Gxy = jnp.sum(Ix * Iy, axis=1)
    Gyy = jnp.sum(Iy * Iy, axis=1)
    det = Gxx * Gyy - Gxy * Gxy
    inv_det = 1.0 / jnp.maximum(det, 1e-8)

    def body(_, dcur):
        cx = px + dcur[:, 0:1]
        cy = py + dcur[:, 1:2]
        e = T - _bilinear_gather(cur, cx, cy)         # [P, K]
        bx = jnp.sum(Ix * e, axis=1)
        by = jnp.sum(Iy * e, axis=1)
        dx = (Gyy * bx - Gxy * by) * inv_det
        dy = (Gxx * by - Gxy * bx) * inv_det
        return dcur + jnp.stack([dx, dy], axis=1)

    d = jax.lax.fori_loop(0, iters, body, d)

    e = T - _bilinear_gather(cur, px + d[:, 0:1], py + d[:, 1:2])
    err = jnp.mean(jnp.abs(e), axis=1)
    return d, err, det


@partial(jax.jit, static_argnames=("win", "iters", "max_err", "min_det"))
def track_points(
    pyr_prev: Tuple[jnp.ndarray, ...],
    pyr_cur: Tuple[jnp.ndarray, ...],
    pts: jnp.ndarray,          # [P, 2] (x, y) in the finest (level-0) image
    valid: jnp.ndarray,        # [P] bool
    win: int = 4,
    iters: int = 8,
    max_err: float = 0.08,
    min_det: float = 1e-4,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Track points from pyr_prev to pyr_cur (coarse-to-fine LK).

    Returns (new_pts [P, 2], new_valid [P], err [P]). A track survives when
    its final photometric residual is below ``max_err`` (images in [0, 1]),
    its template is textured enough (``det >`` min_det), and it lands inside
    the image with a ``win``+1 margin.
    """
    L = len(pyr_prev)
    H, W = pyr_prev[0].shape
    d = jnp.zeros_like(pts)
    err = jnp.zeros(pts.shape[0])
    det = jnp.zeros(pts.shape[0])
    for lvl in range(L - 1, -1, -1):
        scale = 2.0 ** lvl
        d, err, det = _track_level(
            pyr_prev[lvl], pyr_cur[lvl], pts / scale, d, win, iters
        )
        if lvl > 0:
            d = d * 2.0
    new_pts = pts + d
    margin = float(win + 1)
    in_bounds = (
        (new_pts[:, 0] >= margin)
        & (new_pts[:, 0] <= W - 1 - margin)
        & (new_pts[:, 1] >= margin)
        & (new_pts[:, 1] <= H - 1 - margin)
    )
    ok = (
        valid
        & in_bounds
        & (err < max_err)
        & (det > min_det)
        & jnp.all(jnp.isfinite(new_pts), axis=1)
    )
    new_pts = jnp.where(ok[:, None], new_pts, pts)
    return new_pts, ok, err


def _box_sum(x: jnp.ndarray, r: int) -> jnp.ndarray:
    """(2r+1)^2 box sum via reduce_window (same padding)."""
    return jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (2 * r + 1, 2 * r + 1), (1, 1), "SAME"
    )


def _max_pool(x: jnp.ndarray, r: int) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (2 * r + 1, 2 * r + 1), (1, 1), "SAME"
    )


@partial(jax.jit, static_argnames=("num_corners", "nms_radius", "border"))
def shi_tomasi_corners(
    gray: jnp.ndarray,
    num_corners: int,
    nms_radius: int = 7,
    border: int = 8,
    min_quality: float = 1e-4,
    occupied_uv: Optional[jnp.ndarray] = None,    # [P, 2] existing points
    occupied_mask: Optional[jnp.ndarray] = None,  # [P] which rows count
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Top-``num_corners`` Shi-Tomasi (min-eigenvalue) corners with NMS.

    Returns (pts [N, 2] float (x, y), score [N]); rows with score <= 0 are
    padding (fewer than N acceptable corners). Corners within ``nms_radius``
    of any (occupied_uv, occupied_mask) point are suppressed, so detection
    replenishes a live track table without duplicating it.
    """
    H, W = gray.shape
    Ix = 0.5 * (jnp.roll(gray, -1, axis=1) - jnp.roll(gray, 1, axis=1))
    Iy = 0.5 * (jnp.roll(gray, -1, axis=0) - jnp.roll(gray, 1, axis=0))
    Ixx = _box_sum(Ix * Ix, 1)
    Ixy = _box_sum(Ix * Iy, 1)
    Iyy = _box_sum(Iy * Iy, 1)
    tr = Ixx + Iyy
    dif = Ixx - Iyy
    score = 0.5 * (tr - jnp.sqrt(dif * dif + 4.0 * Ixy * Ixy))

    # Border + occupancy suppression.
    yy, xx = jnp.mgrid[0:H, 0:W]
    ok = (xx >= border) & (xx < W - border) & (yy >= border) & (yy < H - border)
    score = jnp.where(ok, score, 0.0)
    if occupied_uv is not None:
        occ = jnp.zeros((H, W))
        ox = jnp.clip(jnp.round(occupied_uv[:, 0]), 0, W - 1).astype(jnp.int32)
        oy = jnp.clip(jnp.round(occupied_uv[:, 1]), 0, H - 1).astype(jnp.int32)
        val = (
            occupied_mask.astype(jnp.float32)
            if occupied_mask is not None
            else jnp.ones(occupied_uv.shape[0])
        )
        occ = occ.at[oy, ox].max(val)
        occ = _max_pool(occ, nms_radius)
        score = jnp.where(occ > 0, 0.0, score)

    # NMS: keep strict local maxima of the (2r+1)^2 neighborhood.
    is_max = score >= _max_pool(score, nms_radius)
    score = jnp.where(is_max, score, 0.0)
    score = jnp.where(score > min_quality, score, 0.0)

    top, idx = jax.lax.top_k(score.reshape(-1), num_corners)
    pts = jnp.stack(
        [(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)], axis=1
    )
    return pts, top
