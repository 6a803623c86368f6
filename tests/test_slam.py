"""SLAM frontend + map + MonoVO integration tests."""

import numpy as np
import pytest

from deep_visual_slam_tpu.slam import (
    Frame,
    Map,
    MonoVO,
    Networks,
    extract_features,
    match_descriptors,
)

H, W = 96, 128


def _textured_image(rng, shift=0):
    """Checkerboard + noise image with enough corners for ORB."""
    img = np.zeros((H, W, 3), np.float32)
    tile = 8
    for y in range(0, H, tile):
        for x in range(0, W, tile):
            if ((x + shift) // tile + y // tile) % 2 == 0:
                img[y : y + tile, x : x + tile] = 0.8
    img += rng.uniform(0, 0.2, size=img.shape).astype(np.float32)
    return np.clip(img, 0, 1)


def test_extract_features(rng):
    img = _textured_image(rng)
    kps, des = extract_features(img)
    assert len(kps) > 50
    assert des is not None and des.shape[1] == 32
    assert kps[:, 0].max() < W and kps[:, 1].max() < H


def test_match_descriptors_self(rng):
    img = _textured_image(rng)
    _, des = extract_features(img)
    i1, i2 = match_descriptors(des, des)
    # Self-match: identical descriptors, but Lowe ratio on duplicates may
    # reject some; matched indices must agree where kept.
    assert len(i1) > 0
    assert all(a == b for a, b in zip(i1, i2)) or len(i1) > 10


def test_match_shifted(rng):
    img1 = _textured_image(rng)
    img2 = np.roll(img1, 3, axis=1)  # shift right by 3 px
    _, d1 = extract_features(img1)
    k2, d2 = extract_features(img2)
    i1, i2 = match_descriptors(d1, d2)
    assert len(i1) > 20


def test_map_keyframe_policy(rng):
    m = Map(num_kf=3)
    img = _textured_image(rng)
    depth = np.full((H, W), 2.0, np.float32)
    unc = np.zeros((H, W), np.float32)
    f0 = Frame(m, img, depth, unc, np.eye(4))
    assert m.check_add_key_frame(f0)  # first frame always a keyframe

    # Identical frame: near-zero displacement -> not a keyframe.
    f1 = Frame(m, img, depth, unc, np.eye(4))
    assert not m.check_add_key_frame(f1)

    # Strongly shifted frame -> keyframe.
    img2 = np.roll(img, 16, axis=1)
    f2 = Frame(m, img2, depth, unc, np.eye(4))
    assert m.check_add_key_frame(f2)


def test_keyframe_score_rotation_homography_uses_intrinsics(rng):
    """Pure camera rotation must contribute ~zero translation-flow ft ONLY
    when the rotation homography is formed in pixel space (K R K^-1). The
    reference applies the bare R to pixel coordinates
    (``optimizer.py:76,86``) — the perspective division then scales with
    the pixel magnitude, inflating ft ~50x (measured: score 20-100 at
    0.4 px of true flow), which silently forces EVERY frame to be a
    keyframe. Fixed here (Map.intrinsic3 / KLTFrontend.K3); this test pins
    both the fix and the failure mode of the bug-compat fallback."""
    from deep_visual_slam_tpu.data.synthetic import default_intrinsics

    K3 = np.asarray(default_intrinsics(H, W), np.float64)[:3, :3]
    # Small pure rotation about y.
    th = 0.002
    R = np.array(
        [
            [np.cos(th), 0, np.sin(th)],
            [0, 1, 0],
            [-np.sin(th), 0, np.cos(th)],
        ]
    )
    T2 = np.eye(4)
    T2[:3, :3] = R

    def build(intrinsic3):
        m = Map(num_kf=3)
        m.intrinsic3 = intrinsic3
        img = _textured_image(rng)
        depth = np.full((H, W), 2.0, np.float32)
        unc = np.zeros((H, W), np.float32)
        f0 = Frame(m, img, depth, unc, np.eye(4))
        m.check_add_key_frame(f0)
        # Observed keypoints consistent with the PURE-ROTATION flow: for a
        # ray d, x1 = K R1 d and x2 = K R2 d, so x2 = K R2 R1^-1 K^-1 x1
        # (R1 = I here) — exactly the inverse of the score's correction.
        Hpix = K3 @ R @ np.linalg.inv(K3)
        f1 = Frame(m, img, depth, unc, T2)
        kps = f0.kps.astype(np.float64)
        p = (Hpix @ np.concatenate(
            [kps, np.ones((len(kps), 1))], axis=1).T).T
        f1.kps = (p[:, :2] / p[:, 2:3]).astype(f0.kps.dtype)
        f1.des = f0.des
        return m, f1

    m_fixed, f1 = build(K3)
    assert not m_fixed.check_key_frame(f1), (
        "pure rotation must not trip the keyframe score when ft removes "
        "rotation flow via K R K^-1"
    )
    m_bug, f1b = build(None)  # reference bug-compat fallback
    assert m_bug.check_key_frame(f1b), (
        "the bare-R fallback inflates ft and trips the score — if this "
        "stops holding the fallback semantics changed"
    )


def test_monovo_pipeline_runs(rng):
    """Full SLAM loop over a synthetic translating sequence (untrained nets),
    reference-parity ORB frontend (the KLT default is covered in
    tests/test_klt.py)."""
    from deep_visual_slam_tpu.data.synthetic import default_intrinsics

    import jax.numpy as jnp

    K = default_intrinsics(H, W)
    vo = MonoVO(
        K,
        networks=Networks(image_shape=(H, W), dtype=jnp.float32),
        image_shape=(H, W),
        num_kf=4,
        max_points=64,
        frontend="orb",
    )
    base = _textured_image(rng)
    for i in range(6):
        frame = np.roll(base, 2 * i, axis=1)
        out = vo.process_frame(frame, optimize=True)
        assert out is not None
    assert len(vo.mp.frames) == 6
    assert len(vo.mp.keyframes) >= 1
    traj = vo.trajectory()
    assert traj.shape == (6, 4, 4)
    assert np.isfinite(traj).all()
    # Some points should have been tracked across frames.
    assert len(vo.mp.points) > 10


def test_monovo_uint8_ingest_matches_float(rng):
    """uint8 frames (the low-H2D ingest path: 4x fewer upload bytes) run the
    SAME pipeline as their f32/255 equivalents — KLT tracking, networks and
    windowed BA all scale on device. Trajectories must agree closely (not
    bit-exact: the uint8 signature compiles separate XLA programs)."""
    import jax.numpy as jnp

    from deep_visual_slam_tpu.data.synthetic import (
        default_intrinsics,
        synthetic_multidepth_sequence,
    )

    K = default_intrinsics(H, W)
    frames, K4, _, _ = synthetic_multidepth_sequence(
        8, H, W, seed=11, step_translation=0.02, step_rotation=0.004
    )
    frames_u8 = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
    frames_f32 = [f.astype(np.float32) / 255.0 for f in frames_u8]

    nets = Networks(image_shape=(H, W), dtype=jnp.float32)
    trajs = []
    for fs in (frames_f32, frames_u8):
        vo = MonoVO(K, networks=nets, image_shape=(H, W), num_kf=4,
                    max_points=64, frontend="klt")
        for f in fs:
            vo.process_frame(f, optimize=True)
        trajs.append(vo.trajectory())
    a, b = trajs
    assert np.isfinite(b).all()
    np.testing.assert_allclose(a[:, :3, 3], b[:, :3, 3], atol=2e-3)
    np.testing.assert_allclose(a[:, :3, :3], b[:, :3, :3], atol=2e-3)


def test_device_image_cache_bounded_without_keyframes(rng):
    """register_device_image must evict immediately: a sequence that never
    adds keyframes (static camera) must not grow device memory per frame."""
    import jax.numpy as jnp

    from deep_visual_slam_tpu.slam.map import Map

    mp = Map(num_kf=3)
    img = rng.uniform(size=(24, 32, 3)).astype(np.float32)
    for fid in range(20):
        mp.register_device_image(fid, jnp.asarray(img))
        assert len(mp._dev_images) <= len(mp.keyframes) + 1
    assert len(mp._dev_images) <= 1  # no keyframes -> only the newest frame


def test_anchored_pose_propagation(rng):
    """BA write-backs to a keyframe pose shift the non-keyframes anchored to
    it RIGIDLY (Frame.current_pose): relative poses within an inter-keyframe
    segment are invariant to keyframe corrections, and the refreshed chain
    keeps the trajectory free of discontinuities at keyframes."""
    m = Map(num_kf=4)
    img = _textured_image(rng)
    depth = np.full((H, W), 2.0, np.float32)
    unc = np.zeros((H, W), np.float32)

    kf = Frame(m, img, depth, unc, np.eye(4))
    assert m.check_add_key_frame(kf)
    assert kf.anchor is kf

    # Two odometry frames chained off the keyframe (small translations).
    T1 = np.eye(4); T1[0, 3] = 0.1
    T2 = np.eye(4); T2[0, 3] = 0.2
    f1 = Frame(m, img, depth, unc, T1)
    assert not m.check_add_key_frame(f1)
    f2 = Frame(m, img, depth, unc, T2)
    assert not m.check_add_key_frame(f2)
    assert f1.anchor is kf and f2.anchor is kf

    before_rel = f2.current_pose() @ np.linalg.inv(f1.current_pose())

    # Simulate a BA write-back: correct the keyframe pose.
    corr = np.eye(4)
    corr[:3, :3] = np.array(
        [[0.9950042, -0.0998334, 0], [0.0998334, 0.9950042, 0], [0, 0, 1]]
    )
    corr[1, 3] = 0.05
    kf.pose = corr @ kf.pose

    # Non-keyframes ride the correction rigidly: T_rel (= T1 here, anchor
    # was identity at creation) composed onto the CORRECTED keyframe pose.
    np.testing.assert_allclose(f1.current_pose(), T1 @ corr, atol=1e-12)
    assert not np.allclose(f1.current_pose(), T1)
    np.testing.assert_allclose(
        f1.current_pose(), f1.T_rel_anchor @ kf.pose, atol=1e-12
    )
    # ...so intra-segment relative poses are unchanged.
    after_rel = f2.current_pose() @ np.linalg.inv(f1.current_pose())
    np.testing.assert_allclose(after_rel, before_rel, atol=1e-12)
    # And the keyframe itself reports its corrected pose.
    np.testing.assert_allclose(kf.current_pose(), kf.pose, atol=1e-12)
