"""ORB descriptor matching on the accelerator (MXU bit-matmul).

Replaces the frontend's ``cv2.BFMatcher.knnMatch`` hot spot (O(N^2) hamming
over 3000x3000 256-bit descriptors, ~70 ms on one CPU core,
reference ``slam/frontend.py:46-67``) with a TPU formulation:

    hamming(a, b) = popcount(a XOR b)
                  = |a| + |b| - 2 * <bits(a), bits(b)>

so the full distance matrix is ONE [N, 256] x [256, N] matmul on the MXU
plus rank-1 corrections, and the 2-NN needed for Lowe's ratio test is a
``lax.top_k``. Shapes are padded to a fixed capacity so every frame reuses
one compiled program. The ratio/threshold/dedup post-pass stays on host
(sequential greedy, microseconds).

Measured (3000x3000): cv2 single-core 71 ms; this path 188 ms end-to-end
over the ~100 ms-RPC TPU tunnel (dispatch-latency bound — the matmul itself
is sub-ms of device time), hence opt-in via ``DVS_TPU_MATCHER=1`` for
locally attached chips where it removes the matcher from the host's
critical path entirely.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

CAPACITY = 3072  # >= ORB's nfeatures=3000, multiple of 128 lanes
_BIG = 1e9


def _unpack_bits(des: np.ndarray, capacity: int) -> np.ndarray:
    """[N, 32] uint8 -> [capacity, 256] float32 bit matrix (zero padded)."""
    n = des.shape[0]
    bits = np.unpackbits(des, axis=1).astype(np.float32)  # [N, 256]
    out = np.zeros((capacity, bits.shape[1]), np.float32)
    out[:n] = bits
    return out


@partial(jax.jit, static_argnames=())
def _knn2_device(bits1: jnp.ndarray, bits2: jnp.ndarray,
                 n1: jnp.ndarray, n2: jnp.ndarray):
    """Top-2 smallest hamming distances of every row of bits1 vs bits2.

    bits*: [C, 256] 0/1 float; n1/n2: true row counts (pad rows masked).
    Returns (dists [C, 2] float32, idxs [C, 2] int32).
    """
    s1 = jnp.sum(bits1, axis=1, keepdims=True)          # [C, 1]
    s2 = jnp.sum(bits2, axis=1, keepdims=True).T        # [1, C]
    # MXU: the only O(N^2 * D) term.
    dot = jax.lax.dot_general(
        bits1, bits2.T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dist = s1 + s2 - 2.0 * dot                          # hamming
    # Mask padded columns so they never win the top-k.
    col = jnp.arange(dist.shape[1])[None, :]
    dist = jnp.where(col < n2, dist, _BIG)
    neg, idx = jax.lax.top_k(-dist, 2)
    return -neg, idx


def match_descriptors_device(
    des1: Optional[np.ndarray],
    des2: Optional[np.ndarray],
    ratio: float = 0.75,
    max_distance: float = 32.0,
    capacity: int = CAPACITY,
) -> Tuple[List[int], List[int]]:
    """Drop-in accelerator replacement for
    ``slam.frontend.match_descriptors`` (Lowe ratio 0.75 + hamming < 32 +
    per-side dedup, reference ``slam/frontend.py:46-67``)."""
    if des1 is None or des2 is None or len(des1) < 2 or len(des2) < 2:
        return [], []
    n1, n2 = len(des1), len(des2)
    if n1 > capacity or n2 > capacity:  # fall back for oversized inputs
        # Call the cv2 implementation directly: the env-gated dispatcher
        # would route straight back here (infinite mutual recursion).
        from deep_visual_slam_tpu.slam.frontend import match_descriptors_cv2

        return match_descriptors_cv2(des1, des2)

    bits1 = _unpack_bits(np.asarray(des1, np.uint8), capacity)
    bits2 = _unpack_bits(np.asarray(des2, np.uint8), capacity)
    dists, idxs = jax.device_get(
        _knn2_device(
            jnp.asarray(bits1), jnp.asarray(bits2),
            jnp.int32(n1), jnp.int32(n2),
        )
    )

    out1: List[int] = []
    out2: List[int] = []
    s1, s2 = set(), set()
    for q in range(n1):
        best, second = dists[q]
        train = int(idxs[q, 0])
        if (
            best < ratio * second
            and best < max_distance
            and q not in s1
            and train not in s2
        ):
            out1.append(q)
            out2.append(train)
            s1.add(q)
            s2.add(train)
    return out1, out2
