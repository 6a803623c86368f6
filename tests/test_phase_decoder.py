"""Phase-fused final decoder stage == the reference formulation, exactly.

The fusion rewrites conv3x3_reflect(nearest2x(a)) and the full-res dispconv
into half-res 4-phase convs (models/depthnet.py docstring). These tests pin
the identity on the SAME parameters, including the boundary lemma (1-px
full-res reflect == phase-domain edge padding)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.models import DepthNet
from deep_visual_slam_tpu.models.depthnet import (
    DepthDecoder,
    depth_to_space2,
    space_to_depth2,
)


def test_space_depth_round_trip(rng):
    x = jnp.asarray(rng.uniform(size=(2, 8, 12, 5)).astype(np.float32))
    s = space_to_depth2(x)
    assert s.shape == (2, 4, 6, 20)
    np.testing.assert_array_equal(np.asarray(depth_to_space2(s)), np.asarray(x))
    # channel block p = py*2+px holds phase (py, px)
    np.testing.assert_array_equal(
        np.asarray(s[0, 1, 2, 3 * 5 : 4 * 5]), np.asarray(x[0, 3, 5])
    )


@pytest.mark.parametrize("hw", [(64, 96), (32, 160)])
def test_decoder_phase_fused_equals_standard(rng, hw):
    """Same params, both formulations, float32: identical disps (incl. the
    reflect/edge boundary behavior at every image border)."""
    H, W = hw
    feats = [
        jnp.asarray(rng.normal(size=(2, H // f, W // f, c)).astype(np.float32))
        for f, c in ((2, 64), (4, 64), (8, 128), (16, 256), (32, 512))
    ]
    std = DepthDecoder(dtype=jnp.float32, phase_fused=False)
    fused = DepthDecoder(dtype=jnp.float32, phase_fused=True)
    variables = std.init(jax.random.PRNGKey(0), feats)
    # identical param trees -> the fused module runs on the std's params
    out_std = std.apply(variables, feats)
    out_fused = fused.apply(variables, feats)
    assert set(out_std) == set(out_fused)
    for k in out_std:
        np.testing.assert_allclose(
            np.asarray(out_fused[k]), np.asarray(out_std[k]),
            atol=2e-6, err_msg=str(k),
        )


def test_decoder_phase_fused_no_skips(rng):
    """The no-skip fused variant (fuses only stage 0) matches the standard
    no-skip decoder on shared params."""
    H, W = 64, 96
    feats = [
        jnp.asarray(rng.normal(size=(1, H // f, W // f, c)).astype(np.float32))
        for f, c in ((2, 64), (4, 64), (8, 128), (16, 256), (32, 512))
    ]
    std = DepthDecoder(dtype=jnp.float32, phase_fused=False, use_skips=False)
    fused = DepthDecoder(dtype=jnp.float32, phase_fused=True, use_skips=False)
    variables = std.init(jax.random.PRNGKey(0), feats)
    out_std = std.apply(variables, feats)
    out_fused = fused.apply(variables, feats)
    assert set(out_std) == set(out_fused)
    for k in out_std:
        np.testing.assert_allclose(
            np.asarray(out_fused[k]), np.asarray(out_std[k]),
            atol=2e-6, err_msg=str(k),
        )


def test_depthnet_param_tree_unchanged(rng):
    """phase_fused True/False produce byte-identical parameter trees."""
    x = jnp.zeros((1, 64, 96, 3), jnp.float32)
    v1 = DepthNet(phase_fused=True).init(jax.random.PRNGKey(0), x)
    v2 = DepthNet(phase_fused=False).init(jax.random.PRNGKey(0), x)
    p1 = jax.tree_util.tree_structure(v1)
    p2 = jax.tree_util.tree_structure(v2)
    assert p1 == p2
    for a, b in zip(jax.tree_util.tree_leaves(v1), jax.tree_util.tree_leaves(v2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_s2d_stem_equals_standard(rng):
    """The space-to-depth stem == the stride-2 7x7 stem on shared params,
    float32, including zero-padding borders (models/resnet.py)."""
    from deep_visual_slam_tpu.models.resnet import ResNetEncoder

    for cin_imgs in (1, 2):
        std = ResNetEncoder(num_input_images=cin_imgs)
        s2d = ResNetEncoder(num_input_images=cin_imgs, s2d_stem=True)
        x = jnp.asarray(
            rng.uniform(size=(2, 64, 96, 3 * cin_imgs)).astype(np.float32)
        )
        v = std.init(jax.random.PRNGKey(0), x)
        # identical parameter trees
        assert jax.tree_util.tree_structure(
            s2d.init(jax.random.PRNGKey(0), x)
        ) == jax.tree_util.tree_structure(v)
        f_std = std.apply(v, x, train=False)
        f_s2d = s2d.apply(v, x, train=False)
        for i, (a, b) in enumerate(zip(f_std, f_s2d)):
            np.testing.assert_allclose(
                np.asarray(b), np.asarray(a), atol=2e-5,
                err_msg=f"imgs={cin_imgs} feature {i}",
            )


def test_uncertainty_head_phase_parity(rng):
    """predict_uncertainty adds the ("unc", 0) sigma head; both decoder
    formulations agree on shared params and the param tree stays identical
    across phase_fused (checkpoint compatibility)."""
    H, W = 64, 96
    feats = [
        jnp.asarray(rng.normal(size=(1, H // f, W // f, c)).astype(np.float32))
        for f, c in ((2, 64), (4, 64), (8, 128), (16, 256), (32, 512))
    ]
    std = DepthDecoder(
        dtype=jnp.float32, phase_fused=False, predict_uncertainty=True
    )
    fused = DepthDecoder(
        dtype=jnp.float32, phase_fused=True, predict_uncertainty=True
    )
    variables = std.init(jax.random.PRNGKey(0), feats)
    out_std = std.apply(variables, feats)
    out_fused = fused.apply(variables, feats)
    assert ("unc", 0) in out_std and set(out_std) == set(out_fused)
    assert out_std[("unc", 0)].shape == (1, H, W, 1)
    u = np.asarray(out_std[("unc", 0)])
    assert (u >= 0).all() and (u <= 1).all()  # sigmoid sigma
    for k in out_std:
        np.testing.assert_allclose(
            np.asarray(out_fused[k]), np.asarray(out_std[k]),
            atol=2e-6, err_msg=str(k),
        )
    # same tree STRUCTURE across phase_fused with the head on
    x = jnp.zeros((1, H, W, 3), jnp.float32)
    v1 = DepthNet(phase_fused=True, predict_uncertainty=True).init(
        jax.random.PRNGKey(0), x
    )
    v2 = DepthNet(phase_fused=False, predict_uncertainty=True).init(
        jax.random.PRNGKey(0), x
    )
    assert jax.tree_util.tree_structure(v1) == jax.tree_util.tree_structure(v2)
