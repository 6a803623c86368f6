"""Measure VO train-step DEVICE time vs batch size, with/without remat.

VERDICT r2 #4: bs16 per-chip training regressed vs bs4 (HBM-pressure
regime) with no rematerialization attempt recorded. This sweep times the
whole-step jitted update (synchronized once around a chain of donated
steps, so the tunnel RPC amortizes) for bs in {4, 8, 16} x remat {off, on}
and writes docs/remat_r03.json.

Run on the TPU host:  python scripts/remat_sweep.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_batch(bs, H, W, rng):
    import jax.numpy as jnp

    from deep_visual_slam_tpu.data.base import intrinsics_pyramid_np
    from deep_visual_slam_tpu.data.synthetic import default_intrinsics

    batch = {
        k: jnp.asarray(rng.uniform(size=(bs, H, W, 3)).astype(np.float32))
        for k in ("source_left", "target_image", "source_right")
    }
    pyr = intrinsics_pyramid_np(default_intrinsics(H, W))
    batch["K"] = jnp.tile(pyr[0][0], (bs, 1, 1))
    batch["inv_K"] = jnp.tile(pyr[0][1], (bs, 1, 1))
    for s, (K, iK) in enumerate(pyr):
        batch[f"K_{s}"] = jnp.tile(K, (bs, 1, 1))
        batch[f"inv_K_{s}"] = jnp.tile(iK, (bs, 1, 1))
    return batch


def time_config(bs, remat, H, W, steps=12):
    import jax

    from deep_visual_slam_tpu.models import DepthNet, PoseNet
    from deep_visual_slam_tpu.training import init_vo_models
    from deep_visual_slam_tpu.training.state import TrainState, make_optimizer
    from deep_visual_slam_tpu.training.steps import make_vo_train_step
    from deep_visual_slam_tpu.training.vo_learner import VOLossConfig

    import jax.numpy as jnp

    depth_model = DepthNet(dtype=jnp.bfloat16)
    pose_model = PoseNet(dtype=jnp.bfloat16)
    variables = init_vo_models(
        depth_model, pose_model, (H, W), jax.random.PRNGKey(0)
    )
    tx = make_optimizer(init_lr=1e-4, total_steps=10_000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    step = make_vo_train_step(
        depth_model, pose_model, VOLossConfig(), remat=remat
    )
    batch = make_batch(bs, H, W, np.random.default_rng(0))
    rng = jax.random.PRNGKey(1)

    try:
        state, losses = step(state, batch, rng)  # compile
        jax.block_until_ready(losses)
        t0 = time.perf_counter()
        for _ in range(steps):  # donated state chains the dispatches
            state, losses = step(state, batch, rng)
        jax.block_until_ready(losses)
        dt = (time.perf_counter() - t0) / steps
    except Exception as e:  # OOM at large batch is a result, not a crash
        return {"error": str(e)[:200]}
    return {
        "step_ms": round(dt * 1000, 1),
        "frames_per_sec": round(bs * 3 / dt, 1),
        "loss": float(np.asarray(losses["loss"])),
    }


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640),
                    metavar=("H", "W"))
    ap.add_argument("--batch_sizes", type=int, nargs="+", default=[4, 8, 16])
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--out_json", default="docs/remat_r03.json")
    args = ap.parse_args()

    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    record = {"device": str(jax.devices()[0]), "size": list(args.size),
              "configs": {}}
    for bs in args.batch_sizes:
        for remat in (False, True):
            key = f"bs{bs}_remat{'_on' if remat else '_off'}"
            r = time_config(bs, remat, *args.size, steps=args.steps)
            record["configs"][key] = r
            print(key, r, flush=True)

    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(record, f, indent=1)
    print(f"wrote {args.out_json}")


if __name__ == "__main__":
    main()
