"""Merged-stem VO inference == separate DepthNet/PoseNet applies, exactly
(models/fused_vo.py; stems merge by linearity + shared normalization)."""

import numpy as np

import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.models import DepthNet, PoseNet
from deep_visual_slam_tpu.models.fused_vo import make_fused_vo_apply

H, W = 64, 96


def test_fused_vo_equals_separate(rng):
    depth_model = DepthNet(dtype=jnp.float32)
    pose_model = PoseNet(dtype=jnp.float32)
    frame = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
    prev = jnp.asarray(rng.uniform(size=(1, H, W, 3)).astype(np.float32))
    dv = depth_model.init(jax.random.PRNGKey(0), frame)
    pv = pose_model.init(
        jax.random.PRNGKey(1), jnp.concatenate([frame, prev], axis=-1)
    )

    ref_disps = depth_model.apply(dv, frame, train=False)
    ref_aa, ref_t = pose_model.apply(
        pv, jnp.concatenate([frame, prev], axis=-1), train=False
    )

    fused = make_fused_vo_apply(depth_model, pose_model)
    disps, (aa, t) = fused(dv, pv, frame, prev)

    assert set(disps) == set(ref_disps)
    for k in ref_disps:
        np.testing.assert_allclose(
            np.asarray(disps[k]), np.asarray(ref_disps[k]), atol=1e-6,
            err_msg=str(k),
        )
    np.testing.assert_allclose(np.asarray(aa), np.asarray(ref_aa), atol=1e-7)
    np.testing.assert_allclose(np.asarray(t), np.asarray(ref_t), atol=1e-7)

    # depth_on="second": the SLAM loop's (prev, cur) pairing — depth must
    # come from the SECOND image of the pair.
    fused2 = make_fused_vo_apply(depth_model, pose_model, depth_on="second")
    disps2, (aa2, t2) = fused2(dv, pv, prev, frame)
    ref2 = pose_model.apply(
        pv, jnp.concatenate([prev, frame], axis=-1), train=False
    )
    for k in ref_disps:
        np.testing.assert_allclose(
            np.asarray(disps2[k]), np.asarray(ref_disps[k]), atol=1e-6,
            err_msg=str(k),
        )
    np.testing.assert_allclose(np.asarray(aa2), np.asarray(ref2[0]), atol=1e-7)
    np.testing.assert_allclose(np.asarray(t2), np.asarray(ref2[1]), atol=1e-7)
