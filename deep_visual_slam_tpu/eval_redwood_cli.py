"""CLI: offline Redwood trajectory evaluation (reference ``vo/eval_redwood.py``).

Usage:
    python -m deep_visual_slam_tpu.eval_redwood_cli --config configs/vo.yaml \
        --weights <orbax-params-dir> --output results/redwood
"""

from __future__ import annotations

import argparse
import json
import os


def main() -> None:
    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Redwood trajectory eval")
    parser.add_argument("--config", default=None)
    parser.add_argument("--weights", default=None, help="orbax params checkpoint")
    parser.add_argument("--data_root", default=None)
    parser.add_argument("--output", default="results/redwood")
    parser.add_argument("--scenes", nargs="*", default=None)
    parser.add_argument("--no_scale_correction", action="store_true")
    args = parser.parse_args()

    import jax
    import numpy as np

    from deep_visual_slam_tpu.data.redwood import TEST_SCENES
    from deep_visual_slam_tpu.eval import RedwoodEvaluator, make_pose_fn
    from deep_visual_slam_tpu.models import PoseNet
    from deep_visual_slam_tpu.utils.checkpoint import load_params_only
    from deep_visual_slam_tpu.utils.config import load_config

    config = load_config(args.config)
    t = config["Train"]
    H, W = t["img_h"], t["img_w"]
    root = args.data_root or os.path.join(
        config["Directory"]["data_dir"], "redwood"
    )

    pose_model = PoseNet()
    variables = jax.jit(pose_model.init)(
        jax.random.PRNGKey(0), np.zeros((1, H, W, 6), np.float32)
    )
    if args.weights:
        restored = load_params_only(args.weights, template=dict(variables))
        variables = restored

    pose_fn = make_pose_fn(pose_model, variables, invert=True)
    evaluator = RedwoodEvaluator(pose_fn, root, image_size=(H, W))
    results = evaluator.evaluate(
        scenes=args.scenes or TEST_SCENES,
        output_dir=args.output,
        use_scale_correction=not args.no_scale_correction,
    )
    os.makedirs(args.output, exist_ok=True)
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(results, f, indent=2, default=float)
    for r in results:
        print(
            f"{r['scene']}: ATE {r['ate_rmse']:.4f} m, "
            f"RPE {r['rpe_pos_mean']:.4f} m / {r['rpe_rot_mean_deg']:.3f} deg, "
            f"scale {r['scale_factor']:.3f}"
        )


if __name__ == "__main__":
    main()
