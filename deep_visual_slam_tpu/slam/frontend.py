"""SLAM frontend: ORB features, matching, Frame/Point bookkeeping (host CPU).

Parity target: reference ``slam/frontend.py``:
  - ORB with 3000 features, 8 pyramid levels, scale 1.2 (``:22-44``),
  - BFMatcher KNN + Lowe ratio 0.75 + hamming < 32 + per-side dedup
    (``:46-67``),
  - ``Frame`` holds image/depth/uncertainty/pose/brightness(a, b), keypoints
    and the Point index map (``:98-119``); ``Point`` is a multi-frame track
    whose host is its first observation (``:71-95``).

Divergence (documented): ``Frame.pose`` here is the GLOBAL camera-from-world
transform ``T_cw`` (composed at insertion); the reference stores the
*relative* net pose in ``Frame.pose`` yet feeds it to g2o as if global
(``slam/optimizer.py:248-249``) — an inconsistency we do not reproduce.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Tuple

import cv2
import numpy as np

NUM_FEATURES = 3000

# cv2 detector/matcher construction is not free; the SLAM loop is
# single-threaded, so module-level singletons are safe and save per-frame
# setup cost.
_ORB: Optional["cv2.ORB"] = None
_BF: Optional["cv2.BFMatcher"] = None


def _get_orb():
    global _ORB
    if _ORB is None:
        _ORB = cv2.ORB_create(
            nfeatures=NUM_FEATURES,
            scaleFactor=1.2,
            nlevels=8,
            edgeThreshold=31,
            firstLevel=0,
            WTA_K=2,
            patchSize=31,
        )
    return _ORB


def _get_matcher():
    global _BF
    if _BF is None:
        _BF = cv2.BFMatcher(cv2.NORM_HAMMING)
    return _BF


def extract_features(image: np.ndarray) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """ORB keypoints + descriptors from an RGB (or gray) image.

    Accepts uint8 or float [0,1]; returns ([N, 2] int (x, y), [N, 32] uint8).
    """
    img = image
    if img.dtype != np.uint8:
        img = (np.clip(img, 0.0, 1.0) * 255).astype(np.uint8)
    if img.ndim == 3:
        gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    else:
        gray = img
    kps, des = _get_orb().detectAndCompute(gray, None)
    if not kps:
        return np.zeros((0, 2), np.int32), None
    pts = np.array([(int(k.pt[0]), int(k.pt[1])) for k in kps], np.int32)
    return pts, des


def _env_flag(name: str) -> bool:
    """True for conventional truthy values only ('1', 'true', 'yes', 'on');
    DVS_TPU_MATCHER=0/false must disable, not enable."""
    return os.environ.get(name, "").strip().lower() in ("1", "true", "yes", "on")


def match_descriptors(
    des1: Optional[np.ndarray], des2: Optional[np.ndarray]
) -> Tuple[List[int], List[int]]:
    """Lowe-ratio KNN matching with dedup (reference ``:46-67``).

    Set ``DVS_TPU_MATCHER=1`` to run the O(N^2) hamming 2-NN on the
    accelerator's MXU (``ops/matching.py``) instead of cv2 — wins on locally
    attached chips where the host CPU is the frontend bottleneck; the cv2
    path stays default because a tunnelled chip's per-dispatch RPC latency
    exceeds the 71 ms single-core match.
    """
    if des1 is None or des2 is None or len(des1) < 2 or len(des2) < 2:
        return [], []
    if _env_flag("DVS_TPU_MATCHER"):
        from deep_visual_slam_tpu.ops.matching import match_descriptors_device

        return match_descriptors_device(des1, des2)
    return match_descriptors_cv2(des1, des2)


def match_descriptors_cv2(
    des1: np.ndarray, des2: np.ndarray
) -> Tuple[List[int], List[int]]:
    """The host (cv2 BFMatcher) matching path, env-gate free — also the
    oversized-input fallback target for ``ops.matching``."""
    matches = _get_matcher().knnMatch(des1, des2, k=2)
    idx1, idx2 = [], []
    s1, s2 = set(), set()
    for pair in matches:
        if len(pair) < 2:
            continue
        m, n = pair
        if (
            m.distance < 0.75 * n.distance
            and m.distance < 32
            and m.queryIdx not in s1
            and m.trainIdx not in s2
        ):
            idx1.append(m.queryIdx)
            idx2.append(m.trainIdx)
            s1.add(m.queryIdx)
            s2.add(m.trainIdx)
    return idx1, idx2


def match_frame_kps(f1: "Frame", f2: "Frame") -> Tuple[List[int], List[int]]:
    return match_descriptors(f1.des, f2.des)


class Point:
    """A tracked scene point observed in multiple frames; host = first."""

    def __init__(self, map_):
        self.frames: List["Frame"] = []
        self.idxs: List[int] = []
        self.id = map_.add_point(self)
        self.valid = True

    def get_host_frame(self) -> Tuple["Frame", Tuple[int, int]]:
        f = self.frames[0]
        x, y = f.kps[self.idxs[0]]
        return f, (int(x), int(y))

    def update_host_depth(self, depth: float) -> None:
        f, (x, y) = self.get_host_frame()
        f.depth[y, x] = depth

    def add_observation(self, frame: "Frame", idx: int) -> None:
        assert idx not in frame.pts
        assert frame not in self.frames
        frame.pts[idx] = self
        self.frames.append(frame)
        self.idxs.append(idx)


class Frame:
    """One camera frame: image + net outputs + tracked keypoints."""

    def __init__(
        self,
        map_,
        image: np.ndarray,
        depth: np.ndarray,
        uncertainty: np.ndarray,
        pose: np.ndarray,
        brightness_params: Tuple[float, float] = (1.0, 0.0),
        features: Optional[Tuple[np.ndarray, Optional[np.ndarray]]] = None,
    ):
        self.id = map_.add_frame(self)
        self.image = np.asarray(image)
        # depth is mutated by the BA write-back; force a writable copy (a
        # device array converted via asarray is read-only). None = not
        # fetched (lazy-depth non-keyframes, ``MonoVO(fetch_depth=False)``).
        self.depth = None if depth is None else np.array(depth)
        self.uncertainty = None if uncertainty is None else np.asarray(uncertainty)
        self.pose = np.asarray(pose, np.float64)  # global T_cw
        self.a, self.b = brightness_params
        self.marginalize = False
        # Keyframe anchoring: a non-keyframe stores its pose RELATIVE to the
        # latest keyframe at creation, so backend write-backs to keyframe
        # poses propagate rigidly to the frames chained off them (without
        # this, BA corrections open pose discontinuities between corrected
        # keyframes and the stale odometry frames around them — measured as
        # a 0.65° -> 13° RPE regression on the synthetic fixtures).
        self.anchor = None  # keyframes: self; non-keyframes: last keyframe
        self.T_rel_anchor = None  # T_cw(self) @ inv(T_cw(anchor)) at creation

        # ``features`` lets the caller run ORB while the accelerator is
        # busy (MonoVO overlaps extraction with the async network dispatch).
        self.kps, self.des = features or extract_features(self.image)
        self.pts: Dict[int, Point] = {}

        H, W = self.image.shape[:2]
        if len(self.kps):  # vectorized: a python all() loop here costs ~0.5 ms/frame
            kp = np.asarray(self.kps)
            assert kp.min() >= 0 and kp[:, 0].max() < W and kp[:, 1].max() < H

    def set_anchor(self, anchor: "Frame") -> None:
        """Fix this frame's pose to an anchor keyframe (itself for
        keyframes). Called once the keyframe decision is made."""
        self.anchor = anchor
        self.T_rel_anchor = (
            None if anchor is self
            else self.pose @ np.linalg.inv(anchor.pose)
        )

    def current_pose(self) -> np.ndarray:
        """Global T_cw, refreshed against the anchor keyframe's (possibly
        BA-corrected) current pose. Keyframe poses are authoritative (the
        backend writes them back directly); non-keyframes ride their
        anchor."""
        if self.anchor is None or self.anchor is self:
            return self.pose
        return self.T_rel_anchor @ self.anchor.pose
