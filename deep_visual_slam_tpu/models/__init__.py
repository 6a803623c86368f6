"""Flax model zoo (NHWC, bf16-capable)."""

from deep_visual_slam_tpu.models.resnet import ResNetEncoder
from deep_visual_slam_tpu.models.depthnet import DepthNet, DepthDecoder
from deep_visual_slam_tpu.models.posenet import PoseNet

__all__ = ["ResNetEncoder", "DepthNet", "DepthDecoder", "PoseNet"]
