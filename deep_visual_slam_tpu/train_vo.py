"""CLI: self-supervised VO training (reference ``python vo/train.py``).

Usage:
    python -m deep_visual_slam_tpu.train_vo --config configs/vo.yaml
"""

from __future__ import annotations

import argparse


def main() -> None:
    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="VO self-supervised training")
    parser.add_argument("--config", default=None, help="YAML config path")
    parser.add_argument("--data_root", default=None, help="override data dir")
    parser.add_argument(
        "--no_mesh", action="store_true", help="disable multi-device mesh"
    )
    args = parser.parse_args()

    from deep_visual_slam_tpu.utils.config import load_config
    from deep_visual_slam_tpu.training.vo_trainer import Trainer

    config = load_config(args.config)
    trainer = Trainer(config, data_root=args.data_root, use_mesh=not args.no_mesh)
    trainer.train()


if __name__ == "__main__":
    main()
