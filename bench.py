"""End-to-end VO throughput benchmark (the BASELINE.json north-star metric).

Measures frames/sec/chip of the full monocular-VO inference pipeline at
Redwood resolution (640x480): DepthNet forward + PoseNet forward +
disp->depth + axis-angle->SE3 pose composition — the same per-frame work as
the reference's ``vo/predict.py:63-105`` loop, batched and jitted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is vs the 60 FPS/chip north-star target (BASELINE.md), since
the reference publishes no numbers.

The axon TPU tunnel adds ~100 ms per dispatch, so the benchmark chains CHUNK
steps inside one jitted scan before synchronizing.
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 60.0  # north-star: >= 60 FPS/chip (BASELINE.md)


def slam_bench(n_frames: int = 48, warmup: int = 10) -> None:
    """Time the FULL SLAM loop — ``MonoVO.process_frame`` (fused depth+pose
    dispatch, ORB extraction, matching, keyframe policy, jitted windowed BA)
    — over a synthetic textured 640x480 sequence, with the per-stage split.

    This is the reference per-frame pipeline ``slam/MonoVO.py:15-38``; the
    default bench mode times only the network stack.
    """
    from deep_visual_slam_tpu.data.synthetic import (
        default_intrinsics,
        synthetic_slam_sequence,
    )
    from deep_visual_slam_tpu.slam.monovo import MonoVO

    H, W = 480, 640
    frames, K, _ = synthetic_slam_sequence(n_frames + warmup, H, W, seed=0)
    vo = MonoVO(default_intrinsics(H, W), image_shape=(H, W))

    for f in frames[:warmup]:  # compiles the fused net step + the BA program
        vo.process_frame(f)
    vo.timings = {k: 0.0 for k in vo.timings}
    kf_before = vo.n_keyframes

    start = time.perf_counter()
    for f in frames[warmup:]:
        vo.process_frame(f)
    elapsed = time.perf_counter() - start

    fps = n_frames / elapsed
    stage_ms = {k: round(v / n_frames * 1000, 2) for k, v in vo.timings.items()}
    print(
        json.dumps(
            {
                "metric": "slam_e2e_fps_per_chip_640x480",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "per_frame_ms": stage_ms,
                "keyframes": vo.n_keyframes - kf_before,
                "frames": n_frames,
            }
        )
    )


def main() -> None:
    from deep_visual_slam_tpu.models import DepthNet, PoseNet
    from deep_visual_slam_tpu.ops import (
        disp_to_depth,
        transformation_from_parameters,
    )
    from deep_visual_slam_tpu.training import init_vo_models

    H, W, B = 480, 640, 1
    dtype = jnp.bfloat16
    depth_model = DepthNet(dtype=dtype)
    pose_model = PoseNet(dtype=dtype)
    variables = init_vo_models(depth_model, pose_model, (H, W), jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    prev = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))

    from deep_visual_slam_tpu.models.fused_vo import make_fused_vo_apply

    fused_apply = make_fused_vo_apply(depth_model, pose_model)

    def vo_frame(carry, _):
        world_T, frame, prev_frame = carry
        disps, (aa, t) = fused_apply(
            {"params": params["depth"], "batch_stats": stats["depth"]},
            {"params": params["pose"], "batch_stats": stats["pose"]},
            frame, prev_frame,
        )
        _, depth = disp_to_depth(disps[("disp", 0)], 0.1, 10.0)
        T = transformation_from_parameters(aa[:, 0, 0], t[:, 0, 0])
        world_T = world_T @ T
        # Feed the depth back so the chain can't be dead-code-eliminated.
        frame = frame + 0.0 * depth.mean()
        return (world_T, prev_frame, frame), world_T[:, 0, 3]

    CHUNK = 32

    @jax.jit
    def run_chunk(world_T, frame, prev_frame):
        (world_T, f, p), xs = jax.lax.scan(
            vo_frame, (world_T, frame, prev_frame), None, length=CHUNK
        )
        return world_T, xs

    world_T = jnp.tile(jnp.eye(4), (B, 1, 1))
    # Warm-up / compile.
    out, _ = run_chunk(world_T, frames, prev)
    out.block_until_ready()

    n_chunks = 8
    start = time.perf_counter()
    for _ in range(n_chunks):
        out, _ = run_chunk(out, frames, prev)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    total_frames = n_chunks * CHUNK * B
    fps = total_frames / elapsed
    print(
        json.dumps(
            {
                "metric": "vo_e2e_fps_per_chip_640x480",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
            }
        )
    )


if __name__ == "__main__":
    import sys

    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    if "--slam" in sys.argv:
        slam_bench()
    else:
        main()
