"""YAML config system, schema-compatible with the reference.

The reference passes a raw ``yaml.safe_load`` dict into every constructor
(``vo/train.py:419-420``, ``vo/config.yaml:1-53``). We keep that public API —
the same YAML files drive this framework — plus defaults so partial configs
work, and an experiment-name mangle mirroring ``vo/train.py:47-56``.
"""

from __future__ import annotations

import copy
from pathlib import Path
from typing import Any, Dict

import yaml

VO_DEFAULTS: Dict[str, Any] = {
    "Directory": {
        "exp_name": "vo-tpu",
        "data_dir": "./data/",
        "log_dir": "./tensorboard",
        "weights": "./weights",
        "results": "./results",
    },
    "Dataset": {
        "custom_data": {"mono": False, "stereo": False},
        "mars_logger": {"mono": False, "stereo": False},
        "irs": {"mono": False, "stereo": False},
        "redwood": {"mono": True, "stereo": False},
        "synthetic": {"mono": False, "stereo": False},
    },
    "Train": {
        "mode": "axisAngle",
        "use_shuffle": True,
        "train_plot_interval": 1000,
        "valid_plot_interval": 100,
        "num_workers": 8,
        "valid_freq": 2,
        "save_freq": 1,
        "vis_batch_size": 1,
        "num_source": 1,
        "num_scale": 4,
        "min_depth": 0.1,
        "max_depth": 10.0,
        "ssim_ratio": 0.85,
        "smoothness_ratio": 0.001,
        "auto_mask": True,
        "img_w": 640,
        "img_h": 480,
        "weight_decay": 0.00001,
        "beta1": 0.9,
        "batch_size": 16,
        "epoch": 31,
        "init_lr": 0.0001,
        "final_lr": 0.00001,
        # Pretrained bootstrap (reference vo/train.py:83-98 hard-codes
        # weights/vo/{depth,pose}_net_epoch_30.pth and ImageNet encoders via
        # torchvision; here both are explicit nullable paths — .pth torch
        # state_dicts or cached .npz pytrees, see utils/pretrained.py).
        "pretrained_encoder": None,
        "pretrained_weights": {"depth": None, "pose": None},
        # TPU-native knobs (no reference equivalent):
        "compute_dtype": "bfloat16",
        "seed": 42,
    },
    "Experiment": {
        # Reference: gpus: [0] (vo/config.yaml:51). TPU-native: number of
        # chips to mesh over; null = all visible devices.
        "num_devices": None,
    },
}


def _deep_update(base: Dict, override: Dict) -> Dict:
    for k, v in override.items():
        if isinstance(v, dict) and isinstance(base.get(k), dict):
            _deep_update(base[k], v)
        else:
            base[k] = v
    return base


def load_config(path: str | Path | None = None, overrides: Dict | None = None) -> Dict:
    """Load a (possibly partial) YAML config merged over defaults."""
    cfg = copy.deepcopy(VO_DEFAULTS)
    if path is not None:
        with open(path) as f:
            user = yaml.safe_load(f) or {}
        _deep_update(cfg, user)
    if overrides:
        _deep_update(cfg, overrides)
    return cfg


def experiment_name(config: Dict) -> str:
    """Hyperparameter-mangled run name (reference ``vo/train.py:47-56``)."""
    t = config["Train"]
    return (
        f"{config['Directory']['exp_name']}"
        f"_ep{t['epoch']}_bs{t['batch_size']}"
        f"_lr{t['init_lr']}_{t['img_h']}x{t['img_w']}"
    )


def save_config(config: Dict, path: str | Path) -> None:
    Path(path).parent.mkdir(parents=True, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(config, f, sort_keys=False)
