"""Training engines: self-supervised VO and supervised depth."""

from deep_visual_slam_tpu.training.vo_learner import VOLossConfig, process_batch
from deep_visual_slam_tpu.training.depth_learner import DepthLossConfig, forward_step
from deep_visual_slam_tpu.training.state import (
    TrainState,
    make_optimizer,
    polynomial_lr,
    init_vo_models,
)
from deep_visual_slam_tpu.training.steps import (
    make_vo_train_step,
    make_vo_eval_step,
    make_stereo_train_step,
    make_depth_train_step,
    make_depth_eval_step,
)

__all__ = [
    "VOLossConfig",
    "process_batch",
    "DepthLossConfig",
    "forward_step",
    "TrainState",
    "make_optimizer",
    "polynomial_lr",
    "init_vo_models",
    "make_vo_train_step",
    "make_vo_eval_step",
    "make_stereo_train_step",
    "make_depth_train_step",
    "make_depth_eval_step",
]
