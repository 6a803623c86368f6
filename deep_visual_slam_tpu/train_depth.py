"""CLI: supervised metric-depth training (reference ``python depth/train.py``).

Usage:
    python -m deep_visual_slam_tpu.train_depth --config configs/depth.yaml
"""

from __future__ import annotations

import argparse


def main() -> None:
    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Supervised depth training")
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument(
        "--no_mesh", action="store_true", help="disable multi-device mesh"
    )
    args = parser.parse_args()

    from deep_visual_slam_tpu.utils.config import load_config
    from deep_visual_slam_tpu.training.depth_trainer import Trainer

    config = load_config(args.config)
    trainer = Trainer(config, use_mesh=not args.no_mesh)
    trainer.train()


if __name__ == "__main__":
    main()
