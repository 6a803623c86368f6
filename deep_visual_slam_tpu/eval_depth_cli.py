"""CLI: supervised-depth evaluation (reference ``depth/eval.py``).

Streams the validation split through the depth network, accumulating the
seven standard metrics (abs_rel / sq_rel / rmse / rmse_log / delta^1..3),
and writes a CSV row per dataset plus a summary (the reference's metric CSV
at ``depth/eval.py:98-104``; its network import was stale TF, SURVEY.md §2.7).

Usage:
    python -m deep_visual_slam_tpu.eval_depth_cli --config configs/depth.yaml \
        [--weights <orbax dir>] [--output results/depth_eval.csv]
"""

from __future__ import annotations

import argparse
import os


def main() -> None:
    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Depth metric evaluation")
    parser.add_argument("--config", default=None)
    parser.add_argument("--weights", default=None)
    parser.add_argument("--output", default="results/depth_eval.csv")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import pandas as pd

    from deep_visual_slam_tpu.data.nyu import DepthLoader
    from deep_visual_slam_tpu.eval.metrics import DepthMetrics
    from deep_visual_slam_tpu.models import DepthNet
    from deep_visual_slam_tpu.ops import disp_to_depth
    from deep_visual_slam_tpu.utils.checkpoint import load_params_only
    from deep_visual_slam_tpu.utils.config import load_config

    config = load_config(args.config)
    t = config["Train"]
    H, W = t["img_h"], t["img_w"]

    model = DepthNet(dtype=jnp.bfloat16)
    variables = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, H, W, 3), jnp.float32)
    )
    if args.weights:
        variables = load_params_only(args.weights, template=dict(variables))

    @jax.jit
    def infer(img):
        disps = model.apply(variables, img, train=False)
        _, depth = disp_to_depth(disps[("disp", 0)], t["min_depth"], t["max_depth"])
        return depth

    loader = DepthLoader(config)
    if len(loader.valid_dataset) == 0:
        parser.error("no validation data found; check Dataset flags/data_dir")

    metrics = DepthMetrics(min_depth=t["min_depth"], max_depth=t["max_depth"])
    n = 0
    for batch in loader.valid_loader:
        pred = infer(jnp.asarray(batch["image"]))
        metrics.update(pred, batch["depth"], batch["valid_mask"])
        n += batch["image"].shape[0]

    result = metrics.result()
    os.makedirs(os.path.dirname(os.path.abspath(args.output)), exist_ok=True)
    pd.DataFrame([{"samples": n, **result}]).to_csv(args.output, index=False)
    print(f"evaluated {n} samples")
    for k, v in result.items():
        print(f"  {k}: {v:.4f}")


if __name__ == "__main__":
    main()
