"""Supervised depth training engine (host loop).

Parity target: reference ``depth/train.py`` (``Trainer``): Adam with
(beta1, 0.999) + weight decay (``:66-80``), polynomial LR, epoch loop with
validation metrics (abs_rel etc.) and checkpointing (``:345-372``).
Same TPU-native structure as the VO trainer (one jitted step, bf16, mesh DP,
orbax auto-resume).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.data.loader import device_prefetch
from deep_visual_slam_tpu.data.nyu import DepthLoader
from deep_visual_slam_tpu.eval.metrics import DepthMetrics
from deep_visual_slam_tpu.models import DepthNet
from deep_visual_slam_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicate,
)
from deep_visual_slam_tpu.training.depth_learner import DepthLossConfig
from deep_visual_slam_tpu.training.state import TrainState, make_optimizer
from deep_visual_slam_tpu.training.steps import (
    make_depth_eval_step,
    make_depth_train_step,
)
from deep_visual_slam_tpu.utils.checkpoint import CheckpointManager
from deep_visual_slam_tpu.utils.config import experiment_name
from deep_visual_slam_tpu.utils.logging import MetricsWriter, StepTimer


class Trainer:
    def __init__(self, config: Dict, use_mesh: bool = True):
        self.config = config
        t = config["Train"]
        self.epochs = t["epoch"]
        self.valid_freq = t.get("valid_freq", 2)
        self.save_freq = t.get("save_freq", 1)
        self.batch_size = t["batch_size"]

        dtype = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[
            t.get("compute_dtype", "bfloat16")
        ]
        self.depth_model = DepthNet(dtype=dtype)
        self.loss_cfg = DepthLossConfig.from_config(config)

        # Multi-host init: no-op single-process, jax.distributed on pods.
        from deep_visual_slam_tpu.parallel.distributed import init_distributed

        init_distributed()
        n_dev = config["Experiment"].get("num_devices") or len(jax.devices())
        self.mesh = make_mesh(jax.devices()[:n_dev]) if use_mesh else None

        self.data_loader = DepthLoader(config)
        steps_per_epoch = max(len(self.data_loader.train_loader), 1)

        tx = make_optimizer(
            init_lr=t["init_lr"],
            total_steps=self.epochs * steps_per_epoch,
            beta1=t.get("beta1", 0.9),
            weight_decay=t.get("weight_decay", 0.0),
            power=0.9,
        )
        H, W = t["img_h"], t["img_w"]
        dvars = jax.jit(self.depth_model.init)(
            jax.random.PRNGKey(t.get("seed", 42)),
            jnp.zeros((1, H, W, 3), jnp.float32),
        )
        variables = {
            "params": {"depth": dvars["params"]},
            "batch_stats": {"depth": dvars["batch_stats"]},
        }
        # Pretrained bootstrap (reference depth nets also start from ImageNet
        # encoders, model/resnet_encoder.py:94-98).
        from deep_visual_slam_tpu.utils.pretrained import apply_depth_pretrained

        variables, loaded_msgs = apply_depth_pretrained(variables, config)
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

        self.train_step = make_depth_train_step(
            self.depth_model, self.loss_cfg, mesh=self.mesh
        )
        self.eval_step = make_depth_eval_step(self.depth_model, self.loss_cfg)

        exp = "depth_" + experiment_name(config)
        self.writer = MetricsWriter(
            os.path.join(config["Directory"]["log_dir"], exp)
        )
        self.ckpt = CheckpointManager(
            os.path.join(config["Directory"]["weights"], exp)
        )
        self.start_epoch = 1
        self.state, meta, step = self.ckpt.restore_latest(self.state)
        if step is not None:
            self.start_epoch = (meta or {}).get("epoch", 0) + 1
            print(f"Resumed from checkpoint step {step}")

        self.metrics = DepthMetrics(
            min_depth=self.loss_cfg.min_depth, max_depth=self.loss_cfg.max_depth
        )
        self.timer = StepTimer()
        self.rng = jax.random.PRNGKey(t.get("seed", 42) + 1)

    def train_epoch(self, epoch: int) -> Dict[str, float]:
        self.data_loader.train_loader.set_epoch(epoch)
        sharding = batch_sharding(self.mesh) if self.mesh is not None else None
        total, n = 0.0, 0
        for batch in device_prefetch(
            self.data_loader.train_loader, sharding=sharding
        ):
            self.rng, sub = jax.random.split(self.rng)
            self.state, losses = self.train_step(self.state, batch, sub)
            self.timer.tick()
            n += 1
            if n % 10 == 0 or n == 1:
                host = jax.device_get(losses)
                total += float(host["loss"])
                step = int(jax.device_get(self.state.step))
                self.writer.scalars(
                    {k: float(v) for k, v in host.items()}, step, prefix="train/"
                )
        self.writer.flush()
        return {"loss": total / max(n // 10, 1)}

    def validate(self, epoch: int) -> Dict[str, float]:
        self.metrics.reset()
        agg, n = 0.0, 0
        for batch in device_prefetch(self.data_loader.valid_loader):
            self.rng, sub = jax.random.split(self.rng)
            losses, pred_depth = self.eval_step(self.state, batch, sub)
            agg += float(jax.device_get(losses["loss"]))
            self.metrics.update(
                pred_depth, batch["depth"], batch["valid_mask"]
            )
            n += 1
        if n == 0:
            return {}
        out = {"valid/loss": agg / n}
        out.update({f"valid/{k}": v for k, v in self.metrics.result().items()})
        self.writer.scalars(out, int(jax.device_get(self.state.step)))
        self.writer.flush()
        return out

    def save_checkpoint(self, epoch: int) -> None:
        self.ckpt.save(
            int(jax.device_get(self.state.step)),
            self.state,
            metadata={"epoch": epoch},
        )

    def train(self) -> None:
        for epoch in range(self.start_epoch, self.epochs + 1):
            m = self.train_epoch(epoch)
            print(f"epoch {epoch}/{self.epochs}: loss={m['loss']:.4f}")
            if epoch % self.valid_freq == 0:
                self.validate(epoch)
            if epoch % self.save_freq == 0:
                self.save_checkpoint(epoch)
        self.writer.close()
        self.ckpt.close()
