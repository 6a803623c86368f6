"""Native C++ preprocessing tests (built on demand; skipped without g++)."""

import numpy as np
import pytest

from deep_visual_slam_tpu.native import (
    available,
    jitter_batch,
    resize_normalize_batch,
)

pytestmark = pytest.mark.skipif(
    not available(), reason="native toolchain unavailable"
)


def test_resize_normalize_matches_cv2(rng):
    import cv2

    src = (rng.uniform(size=(4, 60, 80, 3)) * 255).astype(np.uint8)
    out = resize_normalize_batch(src, 48, 64)
    ref = np.stack(
        [cv2.resize(s, (64, 48), interpolation=cv2.INTER_LINEAR) for s in src]
    ).astype(np.float32) / 255.0
    assert out.shape == (4, 48, 64, 3)
    # cv2 uses fixed-point bilinear; agree to uint8-rounding tolerance.
    np.testing.assert_allclose(out, ref, atol=4e-3)


def test_resize_swap_rb(rng):
    src = (rng.uniform(size=(1, 16, 16, 3)) * 255).astype(np.uint8)
    out_rgb = resize_normalize_batch(src, 16, 16, swap_rb=True)
    out_bgr = resize_normalize_batch(src, 16, 16, swap_rb=False)
    np.testing.assert_allclose(out_rgb[..., 0], out_bgr[..., 2], atol=1e-6)
    np.testing.assert_allclose(out_rgb[..., 2], out_bgr[..., 0], atol=1e-6)


def test_identity_resize_is_exact_division(rng):
    src = (rng.uniform(size=(2, 24, 32, 3)) * 255).astype(np.uint8)
    out = resize_normalize_batch(src, 24, 32)
    np.testing.assert_allclose(out, src.astype(np.float32) / 255.0, atol=1e-6)


def test_jitter_matches_python_math(rng):
    imgs = rng.uniform(size=(3, 20, 24, 3)).astype(np.float32)
    b, c, s = 1.1, 0.9, 1.2
    out = jitter_batch(imgs.copy(), b, c, s)
    # Reference math from data/base.py color_jitter (per-image mean, no hue).
    r = imgs * b
    mean = r.mean(axis=(1, 2, 3), keepdims=True)
    r = (r - mean) * c + mean
    gray = 0.299 * r[..., 0:1] + 0.587 * r[..., 1:2] + 0.114 * r[..., 2:3]
    ref = np.clip((r - gray) * s + gray, 0, 1)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_snippet_dataset_uses_native(tmp_path, rng):
    """SnippetDataset output is identical-within-tolerance with and without
    the native path (fallback correctness)."""
    import cv2

    from deep_visual_slam_tpu.data.base import SnippetDataset

    paths = []
    for i in range(8):
        p = str(tmp_path / f"{i}.jpg")
        cv2.imwrite(p, (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8))
        paths.append(p)
    K = np.eye(4, dtype=np.float32)
    ds = SnippetDataset(paths, K, (48, 64), is_train=False, augment=False)
    s_native = ds.__getitem__(0, np.random.default_rng(0))
    # Force the cv2 fallback path.
    stack_cv2 = np.stack([ds._load(i) for i in (0, 1, 2)])
    np.testing.assert_allclose(
        s_native["target_image"], stack_cv2[1], atol=4e-3
    )
