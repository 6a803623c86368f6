"""MXU hamming matcher == cv2 BFMatcher path (ratio/threshold/dedup)."""

import numpy as np

from deep_visual_slam_tpu.ops.matching import match_descriptors_device
from deep_visual_slam_tpu.slam.frontend import match_descriptors


def _descriptors(rng, n, planted_pairs=0, flip_bits=3):
    """Random ORB-like descriptors; optionally plant near-duplicates so a
    deterministic set of strong matches exists (random pairs rarely pass
    Lowe at hamming<32)."""
    d1 = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    d2 = rng.integers(0, 256, size=(n, 32), dtype=np.uint8)
    for i in range(planted_pairs):
        q, t = i, (i * 7) % n
        noisy = d1[q].copy()
        for _ in range(flip_bits):
            byte = rng.integers(0, 32)
            noisy[byte] ^= np.uint8(1 << rng.integers(0, 8))
        d2[t] = noisy
    return d1, d2


def test_device_matcher_equals_cv2():
    rng = np.random.default_rng(0)
    d1, d2 = _descriptors(rng, 300, planted_pairs=40)
    cv_l1, cv_l2 = match_descriptors(d1, d2)
    dv_l1, dv_l2 = match_descriptors_device(d1, d2)
    assert len(cv_l1) >= 30  # the planted pairs match
    assert (cv_l1, cv_l2) == (dv_l1, dv_l2)


def test_device_matcher_unequal_sizes_and_empty():
    rng = np.random.default_rng(1)
    d1, d2 = _descriptors(rng, 200, planted_pairs=20)
    d2 = np.concatenate([d2, rng.integers(0, 256, size=(57, 32), dtype=np.uint8)])
    assert match_descriptors(d1, d2) == match_descriptors_device(d1, d2)
    assert match_descriptors_device(None, d2) == ([], [])
    assert match_descriptors_device(d1[:1], d2) == ([], [])


def test_env_flag_routes_to_device(monkeypatch):
    rng = np.random.default_rng(2)
    d1, d2 = _descriptors(rng, 100, planted_pairs=10)
    expected = match_descriptors(d1, d2)
    monkeypatch.setenv("DVS_TPU_MATCHER", "1")
    assert match_descriptors(d1, d2) == expected


def test_env_flag_zero_disables_device(monkeypatch):
    """DVS_TPU_MATCHER=0/false must route to cv2, not the device path."""
    import deep_visual_slam_tpu.slam.frontend as fe

    rng = np.random.default_rng(3)
    d1, d2 = _descriptors(rng, 50, planted_pairs=5)

    def boom(*a, **k):  # pragma: no cover - should never run
        raise AssertionError("device matcher called despite =0")

    monkeypatch.setattr(
        "deep_visual_slam_tpu.ops.matching.match_descriptors_device", boom
    )
    for off in ("0", "false", "no", "off", ""):
        monkeypatch.setenv("DVS_TPU_MATCHER", off)
        assert fe.match_descriptors(d1, d2) == fe.match_descriptors_cv2(d1, d2)


def test_oversized_fallback_no_recursion(monkeypatch):
    """>capacity inputs under DVS_TPU_MATCHER=1 must hit cv2 directly
    (regression: the env-gated dispatcher used to recurse back here)."""
    from deep_visual_slam_tpu.slam.frontend import match_descriptors_cv2

    monkeypatch.setenv("DVS_TPU_MATCHER", "1")
    rng = np.random.default_rng(4)
    d1, d2 = _descriptors(rng, 40, planted_pairs=8)
    got = match_descriptors_device(d1, d2, capacity=32)  # force oversized
    assert got == match_descriptors_cv2(d1, d2)
