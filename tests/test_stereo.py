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
