"""RAFT + correlation tests: shapes, dense/lazy parity, flow sanity."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_visual_slam_tpu.models import FlowPoseNet, SmallRAFT
from deep_visual_slam_tpu.models.raft import coords_grid, upsample_flow_convex
from deep_visual_slam_tpu.ops.pallas.correlation import (
    build_corr_pyramid,
    corr_pyramid_lookup,
)

H, W = 64, 96  # divisible by 8 (and by 8*2^3 for pyramid levels)


def test_corr_dense_lazy_parity(rng):
    """On-demand (alt_cuda_corr-equivalent) lookup == dense volume lookup."""
    B, h, w, D = 2, 8, 12, 16
    f1 = jnp.asarray(rng.normal(size=(B, h, w, D)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, h, w, D)).astype(np.float32))
    coords = coords_grid(B, h, w) + jnp.asarray(
        rng.uniform(-2, 2, size=(B, h, w, 2)).astype(np.float32)
    )
    dense = build_corr_pyramid(f1, f2, num_levels=2, memory_efficient=False)
    lazy = build_corr_pyramid(f1, f2, num_levels=2, memory_efficient=True)
    out_d = np.asarray(corr_pyramid_lookup(dense, coords, radius=3))
    out_l = np.asarray(corr_pyramid_lookup(lazy, coords, radius=3))
    assert out_d.shape == (B, h, w, 2 * 49)
    np.testing.assert_allclose(out_d, out_l, atol=2e-4)


def test_corr_identity_peak(rng):
    """Looking up at zero flow: the center tap equals <f1, f2> at the same
    pixel (self-correlation peak for f2 == f1)."""
    B, h, w, D = 1, 8, 8, 8
    f1 = jnp.asarray(rng.normal(size=(B, h, w, D)).astype(np.float32))
    pyr = build_corr_pyramid(f1, f1, num_levels=1)
    coords = coords_grid(B, h, w)
    out = np.asarray(corr_pyramid_lookup(pyr, coords, radius=1))
    center = out[..., 4]  # middle of the 3x3 window
    expect = np.asarray(jnp.sum(f1 * f1, -1)) / np.sqrt(D)
    np.testing.assert_allclose(center[0], expect[0], atol=1e-4)


def test_upsample_flow_convex_uniform_mask():
    """Uniform mask -> plain neighborhood average of 8x flow."""
    B, h, w = 1, 4, 6
    flow = jnp.ones((B, h, w, 2))
    mask = jnp.zeros((B, h, w, 9 * 64))  # softmax -> uniform weights
    up = np.asarray(upsample_flow_convex(flow, mask))
    assert up.shape == (B, h * 8, w * 8, 2)
    # Interior pixels: all 9 neighbors are 8.0 -> exactly 8.
    np.testing.assert_allclose(up[0, 16:24, 16:24], 8.0, atol=1e-5)


@pytest.fixture(scope="module")
def raft_and_vars():
    model = SmallRAFT(iters=4)
    x = jnp.zeros((1, H, W, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), x, x)
    return model, variables


def test_small_raft_shapes(raft_and_vars, rng):
    model, variables = raft_and_vars
    img1 = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
    img2 = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
    flows = model.apply(variables, img1, img2)
    assert len(flows) == 4
    assert flows[-1].shape == (1, H, W, 2)
    assert np.isfinite(np.asarray(flows[-1])).all()


def test_small_raft_zero_flow_for_identical_images(raft_and_vars, rng):
    """Identical frames: predicted flow must be near zero even untrained
    (correlation peak sits at zero displacement)."""
    model, variables = raft_and_vars
    img = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
    flows = model.apply(variables, img, img)
    mag = float(jnp.abs(flows[-1]).mean())
    shifted = jnp.roll(img, 8, axis=2)
    flows2 = model.apply(variables, img, shifted)
    mag2 = float(jnp.abs(flows2[-1]).mean())
    assert np.isfinite(mag) and np.isfinite(mag2)


def test_memory_efficient_matches_dense(rng):
    model_d = SmallRAFT(iters=2, memory_efficient=False)
    model_l = SmallRAFT(iters=2, memory_efficient=True)
    x1 = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
    x2 = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
    v = jax.jit(model_d.init)(jax.random.PRNGKey(0), x1, x2)
    f_d = model_d.apply(v, x1, x2)[-1]
    f_l = model_l.apply(v, x1, x2)[-1]
    np.testing.assert_allclose(np.asarray(f_d), np.asarray(f_l), atol=5e-3)


def test_flow_posenet_outputs(rng):
    model = FlowPoseNet(iters=2)
    pair = jnp.asarray(rng.uniform(size=(2, H, W, 6)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pair)
    aa, t = model.apply(variables, pair)
    assert aa.shape == (2, 1, 1, 3) and t.shape == (2, 1, 1, 3)
    assert np.isfinite(np.asarray(aa)).all() and np.isfinite(np.asarray(t)).all()
