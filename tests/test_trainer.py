"""End-to-end trainer smoke tests: VO + depth, checkpoint auto-resume."""

import os

import numpy as np
import pytest

from deep_visual_slam_tpu.utils.config import load_config


def _vo_config(tmp_path):
    return load_config(overrides={
        "Directory": {
            "exp_name": "smoke",
            "data_dir": str(tmp_path / "data") + "/",
            "log_dir": str(tmp_path / "tb"),
            "weights": str(tmp_path / "weights"),
            "results": str(tmp_path / "results"),
        },
        "Dataset": {
            "redwood": {"mono": False},
            "synthetic": {"mono": True, "length": 24},
        },
        "Train": {
            "img_h": 64, "img_w": 96,
            "batch_size": 8, "epoch": 2,
            "valid_freq": 1, "save_freq": 1,
            "num_workers": 2, "compute_dtype": "float32",
        },
        "Experiment": {"num_devices": 8},
    })


@pytest.mark.xdist_group("collectives")
def test_vo_trainer_end_to_end_and_resume(tmp_path):
    """(In the "collectives" group: trains on the full 8-device mesh —
    concurrent 8-device collective programs in different xdist workers
    deadlock on this host; see test_parallel.py's module marker.)"""
    from deep_visual_slam_tpu.training.vo_trainer import Trainer

    cfg = _vo_config(tmp_path)
    trainer = Trainer(cfg)
    assert trainer.steps_per_epoch == 3  # 24 samples / bs 8
    trainer.train()
    final_step = int(np.asarray(trainer.state.step))
    assert final_step == 2 * 3

    # Metrics were written.
    exp_dirs = os.listdir(str(tmp_path / "tb"))
    assert len(exp_dirs) == 1
    jsonl = os.path.join(str(tmp_path / "tb"), exp_dirs[0], "metrics.jsonl")
    assert os.path.getsize(jsonl) > 0

    # Auto-resume: a fresh Trainer picks up from the checkpoint.
    trainer2 = Trainer(cfg)
    assert int(np.asarray(trainer2.state.step)) == final_step
    assert trainer2.start_epoch == 3
    # Params restored identically.
    a = np.asarray(
        next(iter(np.asarray(x) for x in
             __import__("jax").tree_util.tree_leaves(trainer.state.params)))
    )
    b = np.asarray(
        next(iter(np.asarray(x) for x in
             __import__("jax").tree_util.tree_leaves(trainer2.state.params)))
    )
    np.testing.assert_allclose(a, b)


@pytest.mark.xdist_group("collectives")
def test_depth_trainer_smoke(tmp_path, rng):
    """Depth trainer over a real on-disk NYU-format dataset.
    (8-device-mesh training -> "collectives" group, see above.)"""
    import cv2

    # Build fake NYU tree: <root>/nyu_depth_v2/{train,test}/rgb_*/depth_*
    for split, n in (("train", 16), ("test", 8)):
        d = tmp_path / "data" / "nyu_depth_v2" / split
        d.mkdir(parents=True)
        for i in range(n):
            img = (rng.uniform(size=(60, 80, 3)) * 255).astype(np.uint8)
            depth_mm = (rng.uniform(500, 5000, size=(60, 80))).astype(np.uint16)
            cv2.imwrite(str(d / f"rgb_{i:04d}.jpg"), img)
            cv2.imwrite(str(d / f"depth_{i:04d}.png"), depth_mm)

    cfg = load_config(overrides={
        "Directory": {
            "exp_name": "depth-smoke",
            "data_dir": str(tmp_path / "data") + "/",
            "log_dir": str(tmp_path / "tb"),
            "weights": str(tmp_path / "weights"),
            "results": str(tmp_path / "results"),
        },
        "Dataset": {"redwood": {"mono": False}, "nyu_depth_v2": True},
        "Train": {
            "img_h": 64, "img_w": 96,
            "batch_size": 8, "epoch": 1,
            "valid_freq": 1, "save_freq": 1,
            "num_workers": 2, "compute_dtype": "float32",
        },
        "Experiment": {"num_devices": 8},
    })
    from deep_visual_slam_tpu.training.depth_trainer import Trainer

    trainer = Trainer(cfg)
    assert len(trainer.data_loader.train_loader) == 2
    trainer.train()
    assert int(np.asarray(trainer.state.step)) == 2
    # Validation metrics got produced.
    m = trainer.validate(1)
    assert "valid/abs_rel" in m and np.isfinite(m["valid/abs_rel"])


def test_mid_epoch_resume_matches_uninterrupted(tmp_path):
    """A run killed mid-epoch and resumed from a ``save_every_steps``
    checkpoint replays the REST of the epoch step-for-step identically to an
    uninterrupted run: same batches (deterministic permutation fast-forward),
    same rng stream (host key persisted in metadata), same losses
    (VERDICT r2 #6 done-criterion)."""
    import jax

    from deep_visual_slam_tpu.training.vo_trainer import Trainer

    def instrument(tr, record, interrupt_after=None):
        orig = tr.train_step

        def wrapped(state, batch, rng):
            state, losses = orig(state, batch, rng)
            record.append(float(jax.device_get(losses["loss"])))
            if interrupt_after and len(record) >= interrupt_after:
                raise KeyboardInterrupt  # simulated preemption
            return state, losses

        tr.train_step = wrapped

    def cfg(sub, extra):
        c = _vo_config(tmp_path / sub)
        c["Dataset"]["synthetic"]["length"] = 48  # 6 steps/epoch
        c["Train"].update({"epoch": 1, "valid_freq": 10, **extra})
        return c

    # Reference: one uninterrupted epoch of 6 steps.
    ref_losses = []
    tr_a = Trainer(cfg("a", {}), use_mesh=False)
    instrument(tr_a, ref_losses)
    tr_a.train()
    assert len(ref_losses) == 6
    tr_a.writer.close(); tr_a.ckpt.close()

    # Interrupted: checkpoint every 2 steps, die DURING step 5 (the
    # interrupt fires inside the step, before its result can be returned or
    # saved — a real preemption). Last completed save: step_in_epoch=4.
    part_losses = []
    tr_b = Trainer(cfg("b", {"save_every_steps": 2}), use_mesh=False)
    instrument(tr_b, part_losses, interrupt_after=5)
    with pytest.raises(KeyboardInterrupt):
        tr_b.train()
    tr_b.writer.close(); tr_b.ckpt.close()
    assert part_losses == ref_losses[:5]  # same data+rng up to the kill

    # Resume: picks up inside epoch 1 at step_in_epoch=4 and replays
    # steps 5-6 exactly (step 5's work was lost with the preemption).
    resumed = []
    tr_c = Trainer(cfg("b", {"save_every_steps": 2}), use_mesh=False)
    assert tr_c.start_epoch == 1 and tr_c.resume_step_in_epoch == 4
    assert int(np.asarray(tr_c.state.step)) == 4
    instrument(tr_c, resumed)
    tr_c.train()
    tr_c.writer.close(); tr_c.ckpt.close()
    assert len(resumed) == 2  # only the remaining steps of the epoch
    np.testing.assert_allclose(resumed, ref_losses[4:], rtol=0, atol=0)
