"""D3VO uncertainty path: distractor fixtures + Eq.13 BA weighting.

The reference STORES per-point uncertainty weights
(``/root/reference/slam/optimizer.py:126,179`` — ``a^2/(a^2+sqrt(unc)^2)``)
but its runnable driver feeds zeros (``slam/MonoVO.py:19-27``), so the
weighting never does anything upstream. Here the path is real: distractor
fixtures render photometric violations (gain flicker / a moving slab) in a
distinctively textured region, and the uncertainty map (oracle mask now, a
learned head in ``models/depthnet.py``) down-weights exactly those points
inside windowed/global BA.
"""

import numpy as np
import pytest

H, W = 96, 128


def test_multidepth_distractor_contract():
    from deep_visual_slam_tpu.data.synthetic import (
        synthetic_multidepth_sequence,
    )

    # Back-compat: no distractor -> the historical 4-tuple.
    out = synthetic_multidepth_sequence(4, H, W, seed=5)
    assert len(out) == 4

    for kind in ("flicker", "moving"):
        frames, K, poses, depths, masks = synthetic_multidepth_sequence(
            6, H, W, seed=5, distractor=kind
        )
        assert frames.shape == (6, H, W, 3)
        assert masks.shape == (6, H, W) and masks.dtype == bool
        frac = masks.mean()
        assert 0.02 < frac < 0.3, f"{kind}: mask fraction {frac}"
        # The violation must concentrate inside the mask: frame-to-frame
        # intensity change in-mask >> out-of-mask (camera motion only).
        both = masks[1:] & masks[:-1]
        neither = ~(masks[1:] | masks[:-1])
        d = np.abs(frames[1:] - frames[:-1])
        ratio = d[both].mean() / max(d[neither].mean(), 1e-6)
        assert ratio > 2.0, f"{kind}: violation ratio {ratio}"
        # GT depth covers the distractor surface too (the camera really
        # sees it): masked depths must be finite and within scene range.
        assert np.isfinite(depths[masks]).all()
        assert depths[masks].max() < 10.0


def test_slam_sequence_flicker_contract():
    from deep_visual_slam_tpu.data.synthetic import synthetic_slam_sequence

    out = synthetic_slam_sequence(4, H, W, seed=5)
    assert len(out) == 3  # back-compat

    frames, K, poses, masks = synthetic_slam_sequence(
        6, H, W, seed=5, distractor="flicker"
    )
    assert frames.shape == (6, H, W, 3)
    assert masks.shape == (6, H, W)
    frac = masks.mean()
    assert 0.02 < frac < 0.3
    both = masks[1:] & masks[:-1]
    neither = ~(masks[1:] | masks[:-1])
    d = np.abs(frames[1:] - frames[:-1])
    assert d[both].mean() > 2.0 * d[neither].mean()

    with pytest.raises(ValueError):
        synthetic_slam_sequence(4, H, W, distractor="moving")


def test_oracle_uncertainty_downweights_ba_points(rng):
    """oracle_uncertainty flows frame -> Map -> BAProblem.weight: points
    hosted inside the distractor mask get Eq.13 weight a^2/(a^2+unc) ~ 0,
    everything else stays at 1."""
    import jax.numpy as jnp

    from deep_visual_slam_tpu.data.synthetic import (
        default_intrinsics,
        synthetic_multidepth_sequence,
    )
    from deep_visual_slam_tpu.slam import MonoVO, Networks

    frames, K4, gt_cw, gt_depths, masks = synthetic_multidepth_sequence(
        6, H, W, seed=7, step_translation=0.02, step_rotation=0.004,
        distractor="flicker",
    )
    K = default_intrinsics(H, W)
    vo = MonoVO(K, networks=Networks(image_shape=(H, W), dtype=jnp.float32),
                image_shape=(H, W), num_kf=4, max_points=64, frontend="klt")
    unc_value = 24.0
    for i, f in enumerate(frames):
        vo.process_frame(
            f, optimize=False,
            oracle_uncertainty=masks[i].astype(np.float32) * unc_value,
        )

    kf = vo.mp.keyframes[-1]
    np.testing.assert_array_equal(
        kf.uncertainty, masks[kf.id].astype(np.float32) * unc_value
    )

    window = vo.mp.keyframes[-vo.mp.num_kf:]
    built = vo.mp._build_problem(K, window, vo.mp.max_points)
    assert built is not None
    prob, points = built
    weight = np.asarray(prob.weight)
    host_idx = np.asarray(prob.host_idx)
    host_uv = np.asarray(prob.host_uv)
    n_pts = len(points)
    assert n_pts > 10

    alpha = vo.mp.alpha
    w_lo = alpha**2 / (alpha**2 + unc_value)
    in_mask = np.zeros(n_pts, bool)
    for p in range(n_pts):
        f = window[host_idx[p]]
        x, y = host_uv[p].astype(int)
        in_mask[p] = masks[f.id][y, x]
    assert in_mask.any(), "no tracked point hosted inside the distractor"
    assert (~in_mask).any()
    np.testing.assert_allclose(weight[:n_pts][in_mask], w_lo, rtol=1e-5)
    np.testing.assert_allclose(weight[:n_pts][~in_mask], 1.0, rtol=1e-5)


def test_uncertainty_head_trains_toward_violations():
    """The D3VO Eq.5 loss (VOLossConfig.uncertainty) actually trains the
    sigma head: on a batch whose target carries a photometric violation
    (a corrupted stripe no warp can explain), a few steps raise predicted
    sigma inside the stripe relative to the clean region, and the head's
    params receive gradient."""
    import jax
    import jax.numpy as jnp

    from deep_visual_slam_tpu.data.synthetic import synthetic_vo_batch
    from deep_visual_slam_tpu.models import DepthNet, PoseNet
    from deep_visual_slam_tpu.training import (
        TrainState,
        VOLossConfig,
        init_vo_models,
        make_optimizer,
        make_vo_train_step,
    )

    h, w = 64, 96
    depth_model = DepthNet(predict_uncertainty=True)
    pose_model = PoseNet()
    variables = init_vo_models(
        depth_model, pose_model, (h, w), jax.random.PRNGKey(0)
    )
    p0 = np.asarray(
        variables["params"]["depth"]["decoder"]["uncconv_0"]["Conv_0"]["kernel"]
    ).copy()
    state = TrainState.create(
        variables["params"], variables["batch_stats"], make_optimizer(3e-4, 100)
    )
    cfg = VOLossConfig(uncertainty=True)
    step = make_vo_train_step(depth_model, pose_model, cfg)

    batch, _ = synthetic_vo_batch(0, 2, h, w)
    batch = dict(batch)
    # Photometric violation: a noise stripe in the TARGET only.
    rng = np.random.default_rng(0)
    tgt = np.array(batch["target_image"])
    tgt[:, 24:40, :, :] = rng.uniform(size=tgt[:, 24:40].shape).astype(np.float32)
    batch["target_image"] = jnp.asarray(tgt)

    key = jax.random.PRNGKey(1)
    for _ in range(12):
        key, sub = jax.random.split(key)
        state, losses = step(state, batch, sub)
        assert np.isfinite(float(losses["loss"]))

    p1 = np.asarray(
        state.params["depth"]["decoder"]["uncconv_0"]["Conv_0"]["kernel"]
    )
    assert np.abs(p1 - p0).max() > 0  # head receives gradient

    out = depth_model.apply(
        {"params": state.params["depth"],
         "batch_stats": state.batch_stats["depth"]},
        batch["target_image"], train=False,
    )
    sigma = np.asarray(out[("unc", 0)])[..., 0]
    violated = sigma[:, 24:40, :].mean()
    clean = np.concatenate([sigma[:, :24, :], sigma[:, 40:, :]], axis=1).mean()
    assert violated > clean, (violated, clean)
