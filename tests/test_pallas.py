"""Pallas kernel tests (interpret mode on the CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np

from deep_visual_slam_tpu.ops import photometric
from deep_visual_slam_tpu.ops.pallas.photometric_pallas import (
    reprojection_loss_fused,
)


def test_fused_reprojection_matches_xla(rng):
    x = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(2, 48, 64, 3)).astype(np.float32))
    out = reprojection_loss_fused(x, y, 0.85, True)  # interpret=True on CPU
    ref = photometric.reprojection_loss(x, y, 0.85)
    assert out.shape == ref.shape == (2, 48, 64, 1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)


def test_fused_reprojection_gradients_exact(rng):
    x = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(1, 32, 32, 3)).astype(np.float32))
    g1 = jax.grad(lambda a: jnp.mean(reprojection_loss_fused(a, y, 0.85, True)))(x)
    g2 = jax.grad(lambda a: jnp.mean(photometric.reprojection_loss(a, y, 0.85)))(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=1e-6)


def test_fused_reprojection_odd_height(rng):
    """Heights with no clean band divisor fall back to a full-image band."""
    x = jnp.asarray(rng.uniform(size=(1, 36, 64, 3)).astype(np.float32))
    y = jnp.asarray(rng.uniform(size=(1, 36, 64, 3)).astype(np.float32))
    out = reprojection_loss_fused(x, y, 0.85, True)
    ref = photometric.reprojection_loss(x, y, 0.85)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-6)
