"""Native (C++) host-side runtime components, ctypes-bound.

Build happens lazily on first use (``g++ -O3 -fopenmp`` into a cached .so);
every consumer has a pure-Python/cv2 fallback, so the framework works
without a toolchain.
"""

from deep_visual_slam_tpu.native.binding import (
    available,
    resize_normalize_batch,
    jitter_batch,
)

__all__ = ["available", "resize_normalize_batch", "jitter_batch"]
