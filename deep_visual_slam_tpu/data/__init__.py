"""Host-side data pipeline with device prefetch."""

from deep_visual_slam_tpu.data.base import (
    SnippetDataset,
    DepthSampleDataset,
    read_image_rgb,
    color_jitter,
)
from deep_visual_slam_tpu.data.loader import (
    ConcatDataset,
    DataLoader,
    VoDataLoader,
    collate,
    device_prefetch,
    denormalize_image,
)
from deep_visual_slam_tpu.data.nyu import DepthLoader
from deep_visual_slam_tpu.data.redwood import RedwoodDataHandler, RedwoodDataset
from deep_visual_slam_tpu.data.synthetic import (
    SyntheticVoDataset,
    synthetic_vo_batch,
    synthetic_depth_batch,
)

__all__ = [
    "SnippetDataset",
    "DepthSampleDataset",
    "read_image_rgb",
    "color_jitter",
    "ConcatDataset",
    "DataLoader",
    "VoDataLoader",
    "collate",
    "device_prefetch",
    "denormalize_image",
    "DepthLoader",
    "RedwoodDataHandler",
    "RedwoodDataset",
    "SyntheticVoDataset",
    "synthetic_vo_batch",
    "synthetic_depth_batch",
]
