"""Device KLT tracker + Shi-Tomasi detector tests (ops/klt.py) and the
KLT SLAM frontend (slam/klt_frontend.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from deep_visual_slam_tpu.ops.klt import (
    build_pyramid,
    rgb_to_gray,
    shi_tomasi_corners,
    track_points,
)

H, W = 96, 128


def _texture(rng, h=H, w=W):
    """Blocky + smooth texture with strong corners (float gray [0,1])."""
    cells = rng.uniform(size=(h // 8 + 1, w // 8 + 1)).astype(np.float32)
    blocky = np.repeat(np.repeat(cells, 8, axis=0), 8, axis=1)[:h, :w]
    noise = rng.uniform(0, 0.15, size=(h, w)).astype(np.float32)
    return np.clip(0.85 * blocky + noise, 0, 1)


def test_rgb_to_gray_shape(rng):
    img = rng.uniform(size=(H, W, 3)).astype(np.float32)
    g = rgb_to_gray(jnp.asarray(img))
    assert g.shape == (H, W)
    np.testing.assert_allclose(
        np.asarray(g), img @ np.array([0.299, 0.587, 0.114]), atol=1e-5
    )


def test_pyramid_shapes(rng):
    g = jnp.asarray(_texture(rng))
    pyr = build_pyramid(g, 3)
    assert [p.shape for p in pyr] == [(96, 128), (48, 64), (24, 32)]


def test_detector_finds_checkerboard_corners(rng):
    g = jnp.asarray(_texture(rng))
    pts, score = shi_tomasi_corners(g, 64, nms_radius=4)
    pts, score = np.asarray(pts), np.asarray(score)
    n = int((score > 0).sum())
    assert n > 30
    # All detected corners respect the border margin.
    live = pts[score > 0]
    assert live[:, 0].min() >= 8 and live[:, 0].max() < W - 8
    assert live[:, 1].min() >= 8 and live[:, 1].max() < H - 8


def test_detector_occupancy_suppression(rng):
    g = jnp.asarray(_texture(rng))
    pts, score = shi_tomasi_corners(g, 32, nms_radius=4)
    occupied = pts
    occ_mask = score > 0
    pts2, score2 = shi_tomasi_corners(
        g, 32, nms_radius=4, occupied_uv=occupied, occupied_mask=occ_mask
    )
    pts2, score2 = np.asarray(pts2), np.asarray(score2)
    live1 = np.asarray(pts)[np.asarray(score) > 0]
    live2 = pts2[score2 > 0]
    # New detections keep their distance from the occupied set.
    if len(live2):
        d = np.linalg.norm(live1[None] - live2[:, None], axis=-1).min()
        assert d > 4


@pytest.mark.parametrize("shift", [(3.0, 0.0), (0.0, 2.0), (5.0, -4.0)])
def test_track_pure_translation(rng, shift):
    """LK must recover a known sub-pyramid-range translation to <0.2 px."""
    tex = _texture(rng, H * 2, W * 2)  # oversized so the shift has support
    sx, sy = shift
    prev = tex[32 : 32 + H, 32 : 32 + W]
    # Shift by integer amounts via slicing (exact, no resampling error).
    cur = tex[32 - int(sy) : 32 - int(sy) + H, 32 - int(sx) : 32 - int(sx) + W]

    pyr_p = tuple(build_pyramid(jnp.asarray(prev), 3))
    pyr_c = tuple(build_pyramid(jnp.asarray(cur), 3))
    pts, score = shi_tomasi_corners(jnp.asarray(prev), 48, nms_radius=4)
    valid = score > 0
    new_pts, ok, err = track_points(pyr_p, pyr_c, pts, valid)
    new_pts, ok = np.asarray(new_pts), np.asarray(ok)
    assert ok.sum() > 15
    flow = (new_pts - np.asarray(pts))[ok]
    np.testing.assert_allclose(
        flow.mean(axis=0), [sx, sy], atol=0.2
    )
    assert np.abs(flow - np.array([sx, sy])).max() < 1.0


def test_track_invalid_stays_invalid(rng):
    g = jnp.asarray(_texture(rng))
    pyr = tuple(build_pyramid(g, 3))
    pts = jnp.asarray(rng.uniform(10, 80, size=(16, 2)).astype(np.float32))
    valid = jnp.zeros(16, bool)
    _, ok, _ = track_points(pyr, pyr, pts, valid)
    assert not np.asarray(ok).any()


def test_track_flat_region_rejected(rng):
    """Tracks on textureless regions must be dropped (det gate)."""
    img = np.zeros((H, W), np.float32)
    img[:, : W // 2] = _texture(rng)[:, : W // 2]  # right half flat
    pyr = tuple(build_pyramid(jnp.asarray(img), 3))
    pts = np.array([[W - 20, H // 2], [W - 30, H // 3]], np.float32)
    _, ok, _ = track_points(pyr, pyr, jnp.asarray(pts), jnp.ones(2, bool))
    assert not np.asarray(ok).any()


def test_monovo_klt_pipeline(rng):
    """Full SLAM loop with the TPU-native KLT frontend (default): device
    tracking feeds Frame/Point bookkeeping and windowed photometric BA with
    zero per-frame host vision work."""
    from deep_visual_slam_tpu.data.synthetic import default_intrinsics
    from deep_visual_slam_tpu.slam import MonoVO, Networks

    K = default_intrinsics(H, W)
    vo = MonoVO(
        K,
        networks=Networks(image_shape=(H, W), dtype=jnp.float32),
        image_shape=(H, W),
        num_kf=4,
        max_points=64,
    )
    assert vo.frontend_kind == "klt"
    base = np.repeat(_texture(rng, H * 2, W * 2)[..., None], 3, axis=-1)
    for i in range(6):
        frame = base[0:H, 4 * i : 4 * i + W]  # 4 px/frame right pan
        depth, unc, pose, a, b = vo.process_frame(frame, optimize=True)
        assert np.isfinite(depth).all() and np.isfinite(pose).all()
    assert len(vo.mp.frames) == 6
    assert len(vo.mp.keyframes) >= 1
    # Device tracking must carry live tracks (slots tracked, not starved).
    assert vo.klt.alive.sum() > 16
    # Tracks observed in >=2 keyframes became multi-frame Points.
    multi = [p for p in vo.mp.points if len(p.frames) >= 2]
    assert len(multi) > 5
    traj = vo.trajectory()
    assert traj.shape == (6, 4, 4) and np.isfinite(traj).all()
    # The frontend stage must be cheap: no ORB/KNN on the hot path.
    assert vo.timings["frontend"] < vo.timings["networks"]


def test_monovo_klt_lazy_depth_fetch(rng):
    """fetch_depth=False: non-keyframes return depth=None (no dense D2H);
    keyframes still fetch host depth for the BA problem."""
    from deep_visual_slam_tpu.data.synthetic import default_intrinsics
    from deep_visual_slam_tpu.slam import MonoVO, Networks

    K = default_intrinsics(H, W)
    vo = MonoVO(
        K,
        networks=Networks(image_shape=(H, W), dtype=jnp.float32),
        image_shape=(H, W),
        num_kf=4,
        max_points=64,
        fetch_depth=False,
    )
    base = np.repeat(_texture(rng, H * 2, W * 2)[..., None], 3, axis=-1)
    depths = []
    for i in range(6):
        frame = base[0:H, 2 * i : 2 * i + W]  # slow pan -> some non-keyframes
        depth, unc, pose, a, b = vo.process_frame(frame, optimize=True)
        depths.append(depth)
        assert np.isfinite(pose).all()
    n_kf = len({f.id for f in vo.mp.keyframes} | {0})
    fetched = [d for d in depths if d is not None]
    skipped = [d for d in depths if d is None]
    assert len(skipped) == 6 - vo.n_keyframes  # exactly non-keyframes skip
    for d in fetched:
        assert d.shape == (H, W) and np.isfinite(d).all()
    for f in vo.mp.keyframes:
        assert f.depth is not None  # BA always has host depth


def test_klt_frontend_rehosts_after_marginalization(rng):
    """After BA marginalizes a keyframe, its Points die; the frontend must
    free those slots and re-host surviving tracks at the next keyframe."""
    from deep_visual_slam_tpu.data.synthetic import default_intrinsics
    from deep_visual_slam_tpu.slam import MonoVO, Networks

    K = default_intrinsics(H, W)
    vo = MonoVO(
        K,
        networks=Networks(image_shape=(H, W), dtype=jnp.float32),
        image_shape=(H, W),
        num_kf=3,
        max_points=48,
    )
    base = np.repeat(_texture(rng, H * 2, W * 2)[..., None], 3, axis=-1)
    for i in range(10):
        frame = base[0:H, 6 * i : 6 * i + W]  # fast pan -> many keyframes
        vo.process_frame(frame, optimize=True)
    assert vo.n_keyframes >= 4  # window overflowed -> marginalization ran
    # Every live slot's point pointer is either None or a valid Point.
    for slot in range(vo.klt.P):
        pt = vo.klt.points[slot]
        assert pt is None or pt.valid
