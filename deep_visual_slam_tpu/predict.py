"""CLI: VO inference + trajectory integration + 3D visualization.

Parity target: reference ``vo/predict.py`` — per test batch: PoseNet on the
(target, source_right) pair, DepthNet on the target, world-pose composition
``world_T @= pred_transform``, and 3D point-cloud/trajectory rendering.
The reference renders with a live PyVista window (``vo/utils/visualization.py``);
this environment is headless so rendering goes through the matplotlib
visualizer (``utils/viz.py``) into PNG/MP4 artifacts instead.

Usage:
    python -m deep_visual_slam_tpu.predict --config configs/vo.yaml \
        [--weights <orbax dir>] [--output results/predict] [--max_frames N]
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="VO inference + visualization")
    parser.add_argument("--config", default=None)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--output", default="results/predict")
    parser.add_argument("--max_frames", type=int, default=200)
    parser.add_argument("--pointcloud_every", type=int, default=10)
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from deep_visual_slam_tpu.data.loader import VoDataLoader
    from deep_visual_slam_tpu.models import DepthNet, PoseNet
    from deep_visual_slam_tpu.ops import (
        backproject,
        disp_to_depth,
        transformation_from_parameters,
    )
    from deep_visual_slam_tpu.training import init_vo_models
    from deep_visual_slam_tpu.utils.checkpoint import load_params_only
    from deep_visual_slam_tpu.utils.config import load_config
    from deep_visual_slam_tpu.utils.viz import Visualizer

    config = load_config(args.config)
    t = config["Train"]
    H, W = t["img_h"], t["img_w"]

    depth_model = DepthNet(dtype=jnp.bfloat16)
    pose_model = PoseNet(dtype=jnp.bfloat16)
    variables = init_vo_models(depth_model, pose_model, (H, W), jax.random.PRNGKey(0))
    if args.weights:
        variables = load_params_only(args.weights, template=variables)
    dv = {"params": variables["params"]["depth"],
          "batch_stats": variables["batch_stats"]["depth"]}
    pv = {"params": variables["params"]["pose"],
          "batch_stats": variables["batch_stats"]["pose"]}

    from deep_visual_slam_tpu.models.fused_vo import make_fused_vo_apply

    # Merged-stem fused inference (models/fused_vo.py): depth on target,
    # pose on the (target, source_right) pair — reference vo/predict.py:72.
    fused = make_fused_vo_apply(depth_model, pose_model, depth_on="first")

    @jax.jit
    def step(target, source_right, inv_K):
        disps, (aa, tr) = fused(dv, pv, target, source_right)
        _, depth = disp_to_depth(disps[("disp", 0)], t["min_depth"], t["max_depth"])
        T = transformation_from_parameters(aa[:, 0, 0], tr[:, 0, 0])
        points = backproject(depth[..., 0], inv_K)
        return depth[..., 0], T, points

    loader = VoDataLoader(config, root_dir=args.data_root)
    if len(loader.test_dataset) == 0:
        parser.error(
            "no test data found; enable a dataset in the config "
            "(Dataset.redwood.mono or Dataset.synthetic.mono)"
        )

    os.makedirs(args.output, exist_ok=True)
    viz = Visualizer(args.output)
    world_T = np.eye(4)
    n = 0
    for batch in loader.test_loader:
        depth, T, points = step(
            jnp.asarray(batch["target_image"]),
            jnp.asarray(batch["source_right"]),
            jnp.asarray(batch["inv_K"]),
        )
        T = np.asarray(T[0], np.float64)
        world_T = world_T @ T
        viz.add_pose(world_T)
        if n % args.pointcloud_every == 0:
            viz.add_pointcloud(
                np.asarray(points[0]), np.asarray(batch["target_image"][0]),
                world_T, stride=8,
            )
        n += 1
        if n >= args.max_frames:
            break

    viz.render(os.path.join(args.output, "scene.png"))
    np.save(os.path.join(args.output, "trajectory.npy"), np.asarray(viz.poses))
    print(f"predicted {n} frames -> {args.output}/scene.png, trajectory.npy")


if __name__ == "__main__":
    main()
