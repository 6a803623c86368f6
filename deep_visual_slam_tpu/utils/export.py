"""Model export for deployment: StableHLO via ``jax.export``.

Capability parity with the reference's (stale TF-era) export path
(``export_model.py:101-193``): an inference artifact that embeds
  - input preprocessing (uint8 -> [0,1] float, resize assumed done upstream),
  - the network forward,
  - the axis-angle -> 4x4 matrix head for PoseNet
so the consumer feeds raw frames and reads depth maps / pose matrices.

The serialized artifact is portable StableHLO (weights folded in as
constants) loadable with ``jax.export.deserialize`` on any backend.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import export as jexport

from deep_visual_slam_tpu.ops import disp_to_depth, transformation_from_parameters


def make_vo_inference_fn(
    depth_model,
    pose_model,
    depth_variables,
    pose_variables,
    min_depth: float = 0.1,
    max_depth: float = 10.0,
):
    """uint8 frames -> (depth [B,H,W], T_rel [B,4,4], disp [B,H,W,1])."""

    def infer(frame_u8: jnp.ndarray, prev_frame_u8: jnp.ndarray):
        frame = frame_u8.astype(jnp.float32) / 255.0
        prev = prev_frame_u8.astype(jnp.float32) / 255.0
        disps = depth_model.apply(depth_variables, frame, train=False)
        disp0 = disps[("disp", 0)]
        _, depth = disp_to_depth(disp0, min_depth, max_depth)
        pair = jnp.concatenate([prev, frame], axis=-1)
        aa, t = pose_model.apply(pose_variables, pair, train=False)
        T = transformation_from_parameters(aa[:, 0, 0], t[:, 0, 0])
        return depth[..., 0], T, disp0

    return infer


def export_vo_inference(
    depth_model,
    pose_model,
    depth_variables,
    pose_variables,
    path: str,
    image_shape: Tuple[int, int] = (480, 640),
    batch: int = 1,
    min_depth: float = 0.1,
    max_depth: float = 10.0,
    platforms=("cpu", "tpu"),
) -> str:
    """Serialize the full VO inference step to ``<path>`` (StableHLO bytes).

    Exported for every platform in ``platforms`` so one artifact serves both
    TPU serving and CPU smoke tests.
    """
    H, W = image_shape
    infer = make_vo_inference_fn(
        depth_model, pose_model, depth_variables, pose_variables,
        min_depth, max_depth,
    )
    spec = jax.ShapeDtypeStruct((batch, H, W, 3), jnp.uint8)
    exported = jexport.export(jax.jit(infer), platforms=platforms)(spec, spec)
    data = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_exported(path: str):
    """Deserialize an exported artifact; returns a callable via ``.call``."""
    with open(path, "rb") as f:
        data = f.read()
    return jexport.deserialize(bytearray(data))
