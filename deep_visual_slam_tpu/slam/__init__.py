"""SLAM backend: device KLT / host ORB frontends + keyframe map + JAX
photometric BA."""

from deep_visual_slam_tpu.slam.ba import BAProblem, photometric_ba
from deep_visual_slam_tpu.slam.frontend import (
    Frame,
    Point,
    extract_features,
    match_descriptors,
    match_frame_kps,
)
from deep_visual_slam_tpu.slam.klt_frontend import KLTFrontend
from deep_visual_slam_tpu.slam.map import Map
from deep_visual_slam_tpu.slam.monovo import MonoVO, Networks

__all__ = [
    "BAProblem",
    "photometric_ba",
    "Frame",
    "Point",
    "extract_features",
    "match_descriptors",
    "match_frame_kps",
    "KLTFrontend",
    "Map",
    "MonoVO",
    "Networks",
]
