"""Camera projection + bilinear sampling tests, incl. torch parity checks."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from deep_visual_slam_tpu.ops import camera, warp


def _rand_K(B):
    K = np.tile(np.eye(4, dtype=np.float32), (B, 1, 1))
    K[:, 0, 0] = 100.0
    K[:, 1, 1] = 110.0
    K[:, 0, 2] = 31.5
    K[:, 1, 2] = 23.5
    return K


def test_backproject_project_identity(rng):
    """project(backproject(d, K^-1), K, I) recovers the pixel grid."""
    B, H, W = 2, 48, 64
    depth = rng.uniform(0.5, 5.0, size=(B, H, W)).astype(np.float32)
    K = _rand_K(B)
    inv_K = np.linalg.inv(K)
    pts = camera.backproject(jnp.asarray(depth), jnp.asarray(inv_K))
    T = jnp.tile(jnp.eye(4), (B, 1, 1))
    grid = np.asarray(camera.project(pts, jnp.asarray(K), T))
    # Expected: align_corners=True normalized pixel coordinates.
    gx, gy = np.meshgrid(np.arange(W), np.arange(H), indexing="xy")
    ex = (gx / (W - 1) - 0.5) * 2
    ey = (gy / (H - 1) - 0.5) * 2
    np.testing.assert_allclose(grid[..., 0], np.broadcast_to(ex, (B, H, W)), atol=1e-4)
    np.testing.assert_allclose(grid[..., 1], np.broadcast_to(ey, (B, H, W)), atol=1e-4)


def test_backproject_known_point():
    """Principal-point pixel backprojects to (0, 0, depth)."""
    K = _rand_K(1)
    inv_K = jnp.asarray(np.linalg.inv(K))
    depth = jnp.full((1, 48, 64), 2.0)
    pts = np.asarray(camera.backproject(depth, inv_K))
    # cx=31.5, cy=23.5 lie between pixels; check pixel (32, 24) analytically.
    expect = np.array([(32 - 31.5) / 100.0 * 2.0, (24 - 23.5) / 110.0 * 2.0, 2.0])
    np.testing.assert_allclose(pts[0, 24, 32], expect, atol=1e-5)


def test_grid_sample_matches_torch_border_align_true(rng):
    B, H, W, C = 2, 24, 32, 3
    img = rng.uniform(size=(B, H, W, C)).astype(np.float32)
    grid = rng.uniform(-1.3, 1.3, size=(B, H, W, 2)).astype(np.float32)

    ours = np.asarray(warp.grid_sample(jnp.asarray(img), jnp.asarray(grid)))

    timg = torch.from_numpy(img).permute(0, 3, 1, 2)
    tgrid = torch.from_numpy(grid)
    ref = F.grid_sample(timg, tgrid, mode="bilinear", padding_mode="border",
                        align_corners=True)
    ref = ref.permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_grid_sample_zeros_padding_matches_torch(rng):
    B, H, W, C = 1, 16, 16, 2
    img = rng.uniform(size=(B, H, W, C)).astype(np.float32)
    grid = rng.uniform(-1.6, 1.6, size=(B, 8, 8, 2)).astype(np.float32)
    ours = np.asarray(
        warp.grid_sample(jnp.asarray(img), jnp.asarray(grid), padding_mode="zeros")
    )
    ref = F.grid_sample(
        torch.from_numpy(img).permute(0, 3, 1, 2),
        torch.from_numpy(grid),
        mode="bilinear", padding_mode="zeros", align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    # Note: torch zero-pads per-corner; exact border pixels can differ by the
    # blend. Interior + far-outside must match.
    np.testing.assert_allclose(ours, ref, atol=1e-4)


def test_resize_bilinear_matches_torch(rng):
    B, H, W, C = 2, 12, 16, 1
    img = rng.uniform(size=(B, H, W, C)).astype(np.float32)
    ours = np.asarray(warp.resize_bilinear(jnp.asarray(img), 48, 64))
    ref = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), (48, 64),
        mode="bilinear", align_corners=False,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_upsample_nearest_matches_torch(rng):
    img = rng.uniform(size=(1, 5, 7, 3)).astype(np.float32)
    ours = np.asarray(warp.upsample_nearest_2x(jnp.asarray(img)))
    ref = F.interpolate(
        torch.from_numpy(img).permute(0, 3, 1, 2), scale_factor=2, mode="nearest"
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=0)


def test_intrinsics_pyramid():
    K = camera.make_intrinsics(100.0, 110.0, 31.5, 23.5)[None]
    pyr = camera.intrinsics_pyramid(K, 4)
    assert len(pyr) == 4
    K1, invK1 = pyr[1]
    np.testing.assert_allclose(np.asarray(K1)[0, 0, 0], 50.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(K1 @ invK1)[0], np.eye(4), atol=1e-5
    )
