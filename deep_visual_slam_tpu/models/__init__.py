"""Flax model zoo (NHWC, bf16-capable)."""

from deep_visual_slam_tpu.models.resnet import ResNetEncoder
from deep_visual_slam_tpu.models.depthnet import DepthNet, DepthDecoder
from deep_visual_slam_tpu.models.posenet import PoseNet
from deep_visual_slam_tpu.models.raft import RAFT, SmallRAFT, BasicRAFT
from deep_visual_slam_tpu.models.flow_posenet import FlowPoseNet, FlowUpdateModule
from deep_visual_slam_tpu.models.depth_anything import DepthAnythingV2

__all__ = [
    "ResNetEncoder",
    "DepthNet",
    "DepthDecoder",
    "PoseNet",
    "RAFT",
    "SmallRAFT",
    "BasicRAFT",
    "FlowPoseNet",
    "FlowUpdateModule",
    "DepthAnythingV2",
]
