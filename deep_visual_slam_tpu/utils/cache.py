"""Persistent XLA compilation cache.

First 640x480 compiles cost ~13 s on-chip (and ~2 min for the full VO train
step) over the tunnelled TPU; the persistent cache makes every later
process reuse the serialized executables. Measured: DepthNet init compile
13.1 s -> 5.4 s in a fresh process (the remainder is backend init).

Enabled by every CLI entry point, ``bench.py`` and ``__graft_entry__``;
honors an externally-set ``JAX_COMPILATION_CACHE_DIR``.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Turn on the on-disk executable cache; returns the directory used.

    Accelerator backends only: XLA:CPU AOT cache entries embed host
    machine-feature lists whose reload check can error ("+prefer-no-gather
    is not supported on the host machine") even on the same box — and CPU
    compiles are cheap anyway. Returns None when skipped.
    """
    import jax

    try:
        if jax.default_backend() == "cpu":
            return None
    except RuntimeError:
        return None
    path = (
        path
        or os.environ.get("JAX_COMPILATION_CACHE_DIR")
        or os.path.expanduser("~/.cache/deep_visual_slam_tpu/xla")
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
