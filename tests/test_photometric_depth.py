"""SSIM / reprojection / smoothness / depth-metric tests (torch parity)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from deep_visual_slam_tpu.ops import photometric, depth as depth_ops


def _torch_ssim_loss(x, y):
    """Independent torch re-derivation of the reference SSIM loss formula
    (reflect pad 1, 3x3 avg pool, C1=0.01^2, C2=0.03^2)."""
    C1, C2 = 0.01**2, 0.03**2
    x = F.pad(x, (1, 1, 1, 1), mode="reflect")
    y = F.pad(y, (1, 1, 1, 1), mode="reflect")
    mu_x = F.avg_pool2d(x, 3, 1)
    mu_y = F.avg_pool2d(y, 3, 1)
    sigma_x = F.avg_pool2d(x * x, 3, 1) - mu_x**2
    sigma_y = F.avg_pool2d(y * y, 3, 1) - mu_y**2
    sigma_xy = F.avg_pool2d(x * y, 3, 1) - mu_x * mu_y
    n = (2 * mu_x * mu_y + C1) * (2 * sigma_xy + C2)
    d = (mu_x**2 + mu_y**2 + C1) * (sigma_x + sigma_y + C2)
    return torch.clamp((1 - n / d) / 2, 0, 1)


def test_ssim_matches_reference_formula(rng):
    B, H, W, C = 2, 16, 20, 3
    x = rng.uniform(size=(B, H, W, C)).astype(np.float32)
    y = rng.uniform(size=(B, H, W, C)).astype(np.float32)
    ours = np.asarray(photometric.ssim(jnp.asarray(x), jnp.asarray(y)))
    ref = _torch_ssim_loss(
        torch.from_numpy(x).permute(0, 3, 1, 2),
        torch.from_numpy(y).permute(0, 3, 1, 2),
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def test_ssim_identical_images_zero(rng):
    x = rng.uniform(size=(1, 8, 8, 3)).astype(np.float32)
    out = np.asarray(photometric.ssim(jnp.asarray(x), jnp.asarray(x)))
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_reprojection_loss_blend(rng):
    x = rng.uniform(size=(1, 8, 8, 3)).astype(np.float32)
    y = rng.uniform(size=(1, 8, 8, 3)).astype(np.float32)
    full = photometric.reprojection_loss(jnp.asarray(x), jnp.asarray(y), ssim_ratio=0.85)
    l1_only = photometric.reprojection_loss(jnp.asarray(x), jnp.asarray(y), ssim_ratio=0.0)
    expect_l1 = np.abs(x - y).mean(axis=-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(l1_only), expect_l1, atol=1e-6)
    assert full.shape == (1, 8, 8, 1)


def test_smooth_loss_zero_for_constant_disp(rng):
    disp = jnp.ones((1, 8, 8, 1))
    img = jnp.asarray(rng.uniform(size=(1, 8, 8, 3)).astype(np.float32))
    out = float(photometric.smooth_loss(disp, img))
    assert abs(out) < 1e-7


def test_smooth_loss_edge_weighting():
    """Disparity gradient across a strong image edge must be down-weighted."""
    disp = jnp.zeros((1, 4, 4, 1)).at[:, :, 2:, :].set(1.0)
    flat_img = jnp.zeros((1, 4, 4, 3))
    edge_img = jnp.zeros((1, 4, 4, 3)).at[:, :, 2:, :].set(10.0)
    flat = float(photometric.smooth_loss(disp, flat_img))
    edged = float(photometric.smooth_loss(disp, edge_img))
    assert edged < flat


def test_disp_to_depth_range():
    _, d_min = depth_ops.disp_to_depth(jnp.ones(()), 0.1, 10.0)
    _, d_max = depth_ops.disp_to_depth(jnp.zeros(()), 0.1, 10.0)
    np.testing.assert_allclose(float(d_min), 0.1, atol=1e-6)
    np.testing.assert_allclose(float(d_max), 10.0, atol=1e-6)


def test_disp_depth_roundtrip(rng):
    disp = jnp.asarray(rng.uniform(0.01, 0.99, size=(4, 4)).astype(np.float32))
    _, d = depth_ops.disp_to_depth(disp, 0.1, 10.0)
    back = depth_ops.depth_to_disp(d, 0.1, 10.0)
    np.testing.assert_allclose(np.asarray(back), np.asarray(disp), atol=1e-5)


def test_depth_errors_perfect():
    gt = jnp.asarray(np.linspace(1.0, 5.0, 16, dtype=np.float32))
    m = depth_ops.compute_depth_errors(gt, gt)
    assert float(m["abs_rel"]) == 0.0
    assert float(m["rmse"]) == 0.0
    assert float(m["a1"]) == 1.0


def test_masked_depth_errors_ignores_invalid(rng):
    gt = jnp.asarray(rng.uniform(1, 5, size=(32,)).astype(np.float32))
    pred = gt * 1.1
    valid = jnp.arange(32) < 16
    # Corrupt the invalid half of pred wildly; metrics must not change.
    pred_bad = jnp.where(valid, pred, 1000.0)
    m_ref = depth_ops.compute_depth_errors(gt[:16], pred[:16])
    m = depth_ops.masked_depth_errors(gt, pred_bad, valid)
    np.testing.assert_allclose(float(m["abs_rel"]), float(m_ref["abs_rel"]), atol=1e-5)
    np.testing.assert_allclose(float(m["rmse"]), float(m_ref["rmse"]), atol=1e-4)


def test_silog_perfect_prediction_near_zero():
    gt = jnp.asarray(np.linspace(1.0, 5.0, 16, dtype=np.float32))
    out = float(depth_ops.silog_loss(gt, gt, jnp.ones_like(gt, dtype=bool)))
    assert out < 2e-3


def test_silog_matches_reference_formula(rng):
    pred = rng.uniform(0.5, 5.0, size=(64,)).astype(np.float32)
    gt = rng.uniform(0.5, 5.0, size=(64,)).astype(np.float32)
    valid = rng.uniform(size=(64,)) > 0.3
    ours = float(
        depth_ops.silog_loss(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(valid))
    )
    d = np.log(pred[valid]) - np.log(gt[valid])
    ref = np.sqrt((d**2).mean() - 0.85 * d.mean() ** 2)
    np.testing.assert_allclose(ours, ref, atol=1e-5)
