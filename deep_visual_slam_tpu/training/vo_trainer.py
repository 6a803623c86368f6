"""Self-supervised VO training engine (host loop).

Parity target: reference ``vo/train.py`` (``Trainer``):
  - epoch loop over the mono loader, joint Adam over depth+pose params
    (``:114-117``), polynomial LR decay power 0.9 (``:120-124``),
  - TensorBoard scalars + image panels (``:156-162,268-293``),
  - validation every ``valid_freq`` epochs with a trajectory plot
    (``:311-381``), checkpoint every ``save_freq`` epochs (``:383-415``).

TPU-native differences:
  - the whole step (fwd+bwd+update) is one jitted XLA program; bf16 compute,
    no AMP GradScaler (unnecessary in bf16),
  - optional multi-chip data parallelism via a device mesh (the reference is
    single-GPU),
  - orbax checkpoints with **auto-resume** (absent upstream, SURVEY.md §5.4),
  - host data loading overlaps device compute via ``device_prefetch``.
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deep_visual_slam_tpu.data.loader import VoDataLoader, device_prefetch
from deep_visual_slam_tpu.eval.traj_eval import EvalTrajectory
from deep_visual_slam_tpu.models import DepthNet, PoseNet
from deep_visual_slam_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
)
from deep_visual_slam_tpu.training.state import (
    TrainState,
    init_vo_models,
    make_optimizer,
)
from deep_visual_slam_tpu.training.steps import (
    make_stereo_train_step,
    make_vo_eval_step,
    make_vo_train_step,
)
from deep_visual_slam_tpu.training.vo_learner import VOLossConfig
from deep_visual_slam_tpu.utils.checkpoint import CheckpointManager
from deep_visual_slam_tpu.utils.config import experiment_name
from deep_visual_slam_tpu.utils.logging import MetricsWriter, StepTimer


def _dtype_from_config(config) -> jnp.dtype:
    name = config["Train"].get("compute_dtype", "bfloat16")
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class Trainer:
    def __init__(
        self,
        config: Dict,
        data_root: Optional[str] = None,
        use_mesh: bool = True,
    ):
        self.config = config
        t = config["Train"]
        self.epochs = t["epoch"]
        self.valid_freq = t.get("valid_freq", 2)
        self.save_freq = t.get("save_freq", 1)
        self.plot_interval = t.get("train_plot_interval", 1000)
        self.image_shape = (t["img_h"], t["img_w"])
        self.batch_size = t["batch_size"]

        dtype = _dtype_from_config(config)
        self.loss_cfg = VOLossConfig.from_config(config)
        # Train.predict_uncertainty grows the D3VO sigma head on DepthNet
        # and switches the photometric term to the Eq.5 heteroscedastic
        # form (vo_learner.VOLossConfig docstring).
        self.depth_model = DepthNet(
            dtype=dtype, predict_uncertainty=self.loss_cfg.uncertainty
        )
        self.pose_model = PoseNet(dtype=dtype)

        # Multi-host init: no-op single-process, jax.distributed on pods
        # (SURVEY.md §5.8; the reference is single-GPU, vo/train.py:423-431).
        from deep_visual_slam_tpu.parallel.distributed import init_distributed

        init_distributed()
        n_dev = config["Experiment"].get("num_devices") or len(jax.devices())
        self.mesh = make_mesh(jax.devices()[:n_dev]) if use_mesh else None

        # Data
        self.data_loader = VoDataLoader(config, root_dir=data_root)
        steps_per_epoch = max(len(self.data_loader.train_loader), 1)
        self.steps_per_epoch = steps_per_epoch

        # Optimizer: joint Adam over both networks, poly decay over all steps.
        # Interleaved stereo batches are real optimizer updates (one per mono
        # batch until the stereo stream drains each epoch), so they must be
        # counted or the schedule hits end_lr mid-training.
        stereo_loader = self.data_loader.train_stereo_loader
        stereo_per_epoch = (
            min(len(stereo_loader), steps_per_epoch) if stereo_loader else 0
        )
        self.total_updates = self.epochs * (steps_per_epoch + stereo_per_epoch)
        tx = make_optimizer(
            init_lr=t["init_lr"],
            total_steps=self.total_updates,
            beta1=t.get("beta1", 0.9),
            weight_decay=0.0,  # reference VO uses plain Adam (vo/train.py:114)
            power=0.9,
            end_lr=0.0,
        )
        variables = init_vo_models(
            self.depth_model,
            self.pose_model,
            self.image_shape,
            jax.random.PRNGKey(t.get("seed", 42)),
        )
        # Pretrained bootstrap (reference vo/train.py:83-98 +
        # model/resnet_encoder.py:94-98): ImageNet encoder and/or full
        # depth+pose weights, grafted before the optimizer sees the params.
        from deep_visual_slam_tpu.utils.pretrained import apply_vo_pretrained

        variables, loaded_msgs = apply_vo_pretrained(variables, config)
        for msg in loaded_msgs:
            print(msg)
        self.state = TrainState.create(
            variables["params"], variables["batch_stats"], tx
        )
        if self.mesh is not None:
            self.state = self.state.replace(
                params=replicate(self.state.params, self.mesh),
                batch_stats=replicate(self.state.batch_stats, self.mesh),
                opt_state=replicate(self.state.opt_state, self.mesh),
            )

        # Steps
        self.train_step = make_vo_train_step(
            self.depth_model, self.pose_model, self.loss_cfg, mesh=self.mesh,
            remat=t.get("remat", False),
            device_augment=t.get("device_augment", False),
            # Train.accum_steps: gradient accumulation — bs16-effective
            # training (the reference anchor, vo/config.yaml:41-48) as
            # batch_size=8, accum_steps=2 on a chip where bs16 activations
            # hit the HBM wall (docs/remat_r03.json).
            accum_steps=int(t.get("accum_steps", 1)),
        )
        self.eval_step = make_vo_eval_step(
            self.depth_model, self.pose_model, self.loss_cfg, mesh=self.mesh
        )
        # Known-baseline stereo stream (Dataset.*.stereo flags): depth-only
        # photometric supervision interleaved with the mono snippets.
        self.stereo_step = (
            make_stereo_train_step(self.depth_model, self.loss_cfg, mesh=self.mesh)
            if self.data_loader.train_stereo_loader is not None
            else None
        )

        # Logging / checkpointing
        exp = experiment_name(config)
        log_dir = os.path.join(config["Directory"]["log_dir"], exp)
        self.writer = MetricsWriter(log_dir)
        ckpt_dir = os.path.join(config["Directory"]["weights"], exp)
        self.ckpt = CheckpointManager(ckpt_dir)
        self.start_epoch = 1
        self.resume_step_in_epoch = 0
        self.state, meta, step = self.ckpt.restore_latest(self.state)
        self.eval_tool = EvalTrajectory()
        self.timer = StepTimer()
        self.rng = jax.random.PRNGKey(t.get("seed", 42) + 1)
        if step is not None:
            meta = meta or {}
            sie = int(meta.get("step_in_epoch", 0))
            if sie > 0:
                # Mid-epoch checkpoint: RE-ENTER the same epoch, fast-forward
                # the deterministic permutation past the consumed batches and
                # restore the host rng so the remaining steps replay exactly.
                self.start_epoch = meta.get("epoch", 1)
                self.resume_step_in_epoch = sie
                self.rng = jnp.asarray(meta["rng"], dtype=jnp.uint32)
            else:
                self.start_epoch = meta.get("epoch", 0) + 1
            print(
                f"Resumed from checkpoint step {step} (epoch "
                f"{self.start_epoch}, step_in_epoch {sie})"
            )
        # Mid-epoch checkpoint cadence, off by default (reference saves per
        # epoch only; SURVEY §5.4 plans finer-grained recovery for
        # preemptible chips).
        self.save_every_steps = t.get("save_every_steps") or 0

    # ------------------------------------------------------------------
    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.data_loader.train_loader.set_epoch(epoch)
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        running: Dict[str, float] = {}
        count = 0
        if self.resume_step_in_epoch and epoch == self.start_epoch:
            count = self.resume_step_in_epoch
            self.data_loader.train_loader.skip_batches(count)
            self.resume_step_in_epoch = 0
        # Profiling hook (reference has none, SURVEY.md §5.1): set
        # Train.profile_dir to capture an xplane trace of steps 2-6 of the
        # first epoch, viewable in TensorBoard's profiler plugin.
        profile_dir = self.config["Train"].get("profile_dir")
        stereo_iter = None
        if self.stereo_step is not None:
            self.data_loader.train_stereo_loader.set_epoch(epoch)
            if count:  # mid-epoch resume: one stereo batch per mono step
                self.data_loader.train_stereo_loader.skip_batches(count)
            stereo_iter = iter(
                device_prefetch(
                    self.data_loader.train_stereo_loader, sharding=sharding
                )
            )
        for batch in device_prefetch(
            self.data_loader.train_loader, sharding=sharding
        ):
            if profile_dir and epoch == self.start_epoch and count == 2:
                jax.profiler.start_trace(profile_dir)
            self.rng, sub = jax.random.split(self.rng)
            self.state, losses = self.train_step(self.state, batch, sub)
            if stereo_iter is not None:
                stereo_batch = next(stereo_iter, None)
                if stereo_batch is None:
                    stereo_iter = None
                else:
                    self.rng, sub = jax.random.split(self.rng)
                    self.state, stereo_losses = self.stereo_step(
                        self.state, stereo_batch, sub
                    )
                    losses = dict(losses)
                    losses["stereo_loss"] = stereo_losses["loss"]
            if profile_dir and epoch == self.start_epoch and count == 6:
                jax.tree_util.tree_map(
                    lambda x: x.block_until_ready(), losses
                )
                jax.profiler.stop_trace()
                profile_dir = None
            self.timer.tick()
            count += 1
            if self.save_every_steps and count % self.save_every_steps == 0:
                self.save_checkpoint(epoch, step_in_epoch=count)
            # Accumulate EVERY step on-device (no sync; the adds are async
            # scalar dispatches that pipeline behind the step — measured
            # +0.9 ms/step for 6 keys over the tunnelled TPU, ~0.3% of a
            # 640x480 step), so the printed epoch mean covers all steps —
            # the reference's every-N sampling under-counts (vo/train.py:268).
            for k, v in losses.items():
                running[k] = running.get(k, 0.0) + v
                running[f"__n_{k}"] = running.get(f"__n_{k}", 0) + 1
            if count % 10 == 0 or count == 1:
                host_losses = jax.device_get(losses)
                step = int(jax.device_get(self.state.step))
                self.writer.scalars(
                    {k: float(v) for k, v in host_losses.items()},
                    step,
                    prefix="train/",
                )
                self.writer.scalar(
                    "train/frames_per_sec",
                    self.timer.throughput(self.batch_size),
                    step,
                )
        self.writer.flush()
        sums = jax.device_get({k: v for k, v in running.items()
                               if not k.startswith("__n_")})
        return {
            k: float(v) / max(running[f"__n_{k}"], 1) for k, v in sums.items()
        }

    def validate(self, epoch: int) -> Dict[str, float]:
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        self.eval_tool.reset()
        agg: Dict[str, float] = {}
        count = 0
        panel_done = False
        for batch in device_prefetch(
            self.data_loader.valid_loader, sharding=sharding
        ):
            self.rng, sub = jax.random.split(self.rng)
            outputs, losses = self.eval_step(self.state, batch, sub)
            if not panel_done:
                # target/warped/disp image panel (reference
                # vo/utils/plot_utils.py, logged every validation).
                try:
                    from deep_visual_slam_tpu.utils.plot import vo_panel

                    self.writer.image(
                        "valid/panel",
                        vo_panel(jax.device_get(batch), jax.device_get(outputs)),
                        int(jax.device_get(self.state.step)),
                    )
                except Exception as e:
                    print(f"panel render failed: {e}")
                panel_done = True
            host = jax.device_get(losses)
            for k, v in host.items():
                agg[k] = agg.get(k, 0.0) + float(v)
            count += 1
            gt = batch.get("gt_pose_target_to_right")
            self.eval_tool.update_state(
                jax.device_get(outputs["cam_T_cam_right"]),
                jax.device_get(gt) if gt is not None else None,
            )
        if count == 0:
            return {}
        metrics = {f"valid/{k}": v / count for k, v in agg.items()}
        traj_stats = self.eval_tool.metrics()
        metrics.update({f"valid/{k}": v for k, v in traj_stats.items()})
        step = int(jax.device_get(self.state.step))
        self.writer.scalars(metrics, step)
        try:
            self.writer.image(
                "valid/trajectory",
                self.eval_tool.eval_plot(f"epoch {epoch}"),
                step,
            )
        except Exception as e:
            print(f"trajectory plot failed: {e}")
        self.writer.flush()
        return metrics

    def save_checkpoint(self, epoch: int, step_in_epoch: int = 0) -> None:
        """``step_in_epoch=0`` marks a COMPLETED epoch; >0 is a mid-epoch
        save carrying the host rng so a resumed run replays the remaining
        batches of this epoch step-for-step (SURVEY §5.4: iterator state =
        (epoch, step-in-epoch, rng) — the deterministic permutation makes
        the data position recoverable by fast-forward, no iterator pickle)."""
        step = int(jax.device_get(self.state.step))
        self.ckpt.save(step, self.state, metadata={
            "epoch": epoch,
            "step_in_epoch": int(step_in_epoch),
            "rng": np.asarray(jax.device_get(self.rng)).tolist(),
        })

    def train(self) -> None:
        for epoch in range(self.start_epoch, self.epochs + 1):
            train_metrics = self.train_epoch(epoch)
            msg = ", ".join(
                f"{k}={v:.4f}" for k, v in sorted(train_metrics.items())
                if k in ("loss", "grad_norm")
            )
            print(f"epoch {epoch}/{self.epochs}: {msg} "
                  f"({self.timer.throughput(self.batch_size):.1f} frames/s)")
            if epoch % self.valid_freq == 0:
                val = self.validate(epoch)
                if "valid/loss" in val:
                    print(f"  valid loss={val['valid/loss']:.4f}")
            if epoch % self.save_freq == 0:
                self.save_checkpoint(epoch)
        self.writer.close()
        self.ckpt.close()
