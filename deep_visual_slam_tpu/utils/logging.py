"""Metrics/observability writer (TensorBoard + JSONL).

Parity target: the reference's ``SummaryWriter`` usage — scalar losses + LR
per epoch, image panels every N steps, trajectory figure per validation
(``vo/train.py:156-162,268-293,344-375``). Backed by tensorboardX when
available, always mirrored to a JSONL stream so headless runs stay
observable, plus a per-step timing tracker (the reference has no profiling,
SURVEY.md §5.1).
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import numpy as np


class MetricsWriter:
    def __init__(self, log_dir: str, use_tensorboard: bool = True):
        self.log_dir = log_dir
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "metrics.jsonl"), "a")
        self._tb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(log_dir)
            except Exception:
                self._tb = None

    def scalar(self, tag: str, value: float, step: int) -> None:
        if self._jsonl.closed:
            return
        value = float(value)
        self._jsonl.write(
            json.dumps({"tag": tag, "value": value, "step": int(step)}) + "\n"
        )
        if self._tb is not None:
            self._tb.add_scalar(tag, value, step)

    def scalars(self, values: Dict[str, float], step: int, prefix: str = "") -> None:
        for k, v in values.items():
            try:
                self.scalar(prefix + k, float(v), step)
            except (TypeError, ValueError):
                continue

    def image(self, tag: str, image: np.ndarray, step: int) -> None:
        """[H, W, 3] uint8 or [0,1] float image."""
        if self._tb is None:
            return
        img = np.asarray(image)
        if img.dtype != np.uint8:
            img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
        self._tb.add_image(tag, img, step, dataformats="HWC")

    def flush(self) -> None:
        if not self._jsonl.closed:
            self._jsonl.flush()
        if self._tb is not None:
            self._tb.flush()

    def close(self) -> None:
        self.flush()
        if not self._jsonl.closed:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
            self._tb = None


class StepTimer:
    """Rolling step-time / throughput tracker (frames/sec)."""

    def __init__(self, window: int = 50):
        self.window = window
        self._times = []
        self._last: Optional[float] = None

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._times.append(now - self._last)
            if len(self._times) > self.window:
                self._times.pop(0)
        self._last = now

    @property
    def mean_step_time(self) -> float:
        return float(np.mean(self._times)) if self._times else 0.0

    def throughput(self, items_per_step: int) -> float:
        t = self.mean_step_time
        return items_per_step / t if t > 0 else 0.0
