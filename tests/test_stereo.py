"""Stereo training path: loader wiring under Dataset.*.stereo flags, the
known-baseline photometric loss, and end-to-end interleaved training
(VERDICT: 'stereo: true config trains end-to-end; stereo samples visible in
a batch')."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.data.loader import VoDataLoader
from deep_visual_slam_tpu.data.synthetic import SyntheticStereoDataset
from deep_visual_slam_tpu.training.vo_learner import (
    VOLossConfig,
    process_stereo_batch,
)
from deep_visual_slam_tpu.utils.config import load_config

H, W = 64, 96


def _cfg(tmp_path, **dataset):
    return load_config(overrides={
        "Directory": {
            "exp_name": "stereo",
            "data_dir": str(tmp_path / "data") + "/",
            "log_dir": str(tmp_path / "tb"),
            "weights": str(tmp_path / "weights"),
            "results": str(tmp_path / "results"),
        },
        "Dataset": {"redwood": {"mono": False}, **dataset},
        "Train": {
            "img_h": H, "img_w": W,
            "batch_size": 4, "epoch": 1,
            "num_workers": 2, "compute_dtype": "float32",
        },
        "Experiment": {"num_devices": 8},
    })


def _true_disp(depth, min_depth=0.1, max_depth=10.0):
    """Inverse of ops.disp_to_depth: the sigmoid disparity whose scaled
    inverse-depth equals the given metric depth."""
    min_disp, max_disp = 1.0 / max_depth, 1.0 / min_depth
    return (1.0 / depth - min_disp) / (max_disp - min_disp)


def test_stereo_loss_optimum_at_true_depth():
    """The photometric stereo loss is lower at the true depth than at a
    scaled-off depth — pinning the pose/warp convention end to end."""
    ds = SyntheticStereoDataset((H, W), length=2, seed=7)
    s = ds.__getitem__(0)
    batch = {
        k: jnp.asarray(v)[None] for k, v in s.items()
    }
    cfg = VOLossConfig(num_scales=1, auto_mask=False, smoothness_ratio=0.0)

    def apply_with_depth(depth):
        disp = _true_disp(depth)[..., None]  # [B, H, W, 1]

        def depth_apply(_, x, train):
            return {("disp", 0): disp}

        _, losses = process_stereo_batch(
            depth_apply, None, batch, cfg, jax.random.PRNGKey(0)
        )
        return float(losses["loss"])

    depth_true = jnp.asarray(s["depth"])[None]
    loss_true = apply_with_depth(depth_true)
    loss_wrong = apply_with_depth(depth_true * 1.6)
    assert loss_true < 0.02, loss_true
    assert loss_wrong > 3.0 * loss_true, (loss_true, loss_wrong)


def test_vodataloader_stereo_stream(tmp_path):
    cfg = _cfg(
        tmp_path,
        synthetic={"mono": True, "stereo": True, "length": 16},
    )
    dl = VoDataLoader(cfg)
    assert dl.train_stereo_loader is not None
    assert len(dl.train_stereo_dataset) == 16
    batch = next(iter(dl.train_stereo_loader))
    assert batch["source_image"].shape == (4, H, W, 3)
    assert batch["pose"].shape == (4, 4, 4)
    # left-target samples carry the -baseline transform
    assert np.all(np.abs(np.abs(batch["pose"][:, 0, 3]) - 0.1) < 1e-6)

    # mono-only config -> no stereo loaders
    dl2 = VoDataLoader(_cfg(tmp_path, synthetic={"mono": True, "length": 8}))
    assert dl2.train_stereo_loader is None


def test_trainer_interleaves_stereo(tmp_path):
    """stereo: true trains end-to-end; stereo loss appears in the metrics
    and the step counter advances for both streams."""
    from deep_visual_slam_tpu.training.vo_trainer import Trainer

    cfg = _cfg(
        tmp_path,
        synthetic={"mono": True, "stereo": True, "length": 16},
    )
    trainer = Trainer(cfg)
    assert trainer.stereo_step is not None
    metrics = trainer.train_epoch(1)
    assert "stereo_loss" in metrics, sorted(metrics)
    assert np.isfinite(metrics["stereo_loss"])
    # 4 mono steps + 4 stereo steps at bs=4 over 16 samples each
    assert int(np.asarray(trainer.state.step)) == 8


def test_stereo_step_freezes_posenet(tmp_path):
    """A stereo step must be a pure depth update: PoseNet params AND its
    Adam moments stay bit-identical even when stale momentum exists from a
    preceding mono step (regression: zero grads still move params under
    Adam via mu <- b1*mu)."""
    import jax.tree_util as jtu

    from deep_visual_slam_tpu.data.synthetic import (
        SyntheticStereoDataset,
        synthetic_vo_batch,
    )
    from deep_visual_slam_tpu.models import DepthNet, PoseNet
    from deep_visual_slam_tpu.training import (
        TrainState,
        init_vo_models,
        make_optimizer,
        make_stereo_train_step,
        make_vo_train_step,
    )

    depth_model = DepthNet()
    pose_model = PoseNet()
    variables = init_vo_models(depth_model, pose_model, (H, W), jax.random.PRNGKey(0))
    tx = make_optimizer(1e-3, 100)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    cfg = VOLossConfig()

    mono_step = make_vo_train_step(depth_model, pose_model, cfg)
    stereo_step = make_stereo_train_step(depth_model, cfg)

    mono_batch, _ = synthetic_vo_batch(0, 2, H, W)
    ds = SyntheticStereoDataset((H, W), length=2, is_train=True)
    stereo_batch = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *[ds[i] for i in range(2)]
    )

    # Build nonzero PoseNet momentum first.
    state, _ = mono_step(state, mono_batch, jax.random.PRNGKey(1))
    pose_params_before = jax.device_get(state.params["pose"])
    pose_moments_before = jax.device_get(
        [l for p, l in jtu.tree_flatten_with_path(state.opt_state)[0]
         if any(isinstance(k, jtu.DictKey) and k.key == "pose" for k in p)]
    )
    depth_before = jax.device_get(
        jtu.tree_leaves(state.params["depth"])[0]
    )

    state, losses = stereo_step(state, stereo_batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(losses["loss"]))

    pose_params_after = jax.device_get(state.params["pose"])
    pose_moments_after = jax.device_get(
        [l for p, l in jtu.tree_flatten_with_path(state.opt_state)[0]
         if any(isinstance(k, jtu.DictKey) and k.key == "pose" for k in p)]
    )
    jax.tree_util.tree_map(
        np.testing.assert_array_equal, pose_params_after, pose_params_before
    )
    assert pose_moments_before  # the adam state does carry pose subtrees
    for a, b in zip(pose_moments_after, pose_moments_before):
        np.testing.assert_array_equal(a, b)
    # ... while the depth net actually trained.
    depth_after = jax.device_get(jtu.tree_leaves(state.params["depth"])[0])
    assert not np.array_equal(depth_after, depth_before)


def test_trainer_total_updates_counts_stereo(tmp_path):
    """The LR schedule horizon must include interleaved stereo updates
    (regression: it decayed to end_lr at ~50% of training)."""
    from deep_visual_slam_tpu.training.vo_trainer import Trainer

    cfg = _cfg(
        tmp_path,
        synthetic={"mono": True, "stereo": True, "length": 16},
    )
    trainer = Trainer(cfg)
    # 4 mono + 4 stereo updates per epoch at bs=4 over 16 samples each.
    assert trainer.total_updates == trainer.epochs * 8
