"""Host-side dataset bases: 3-frame VO snippets and supervised depth samples.

Behavioral parity with the reference data layer (``vo/dataset/common.py``):
  - snippet sampling with *random temporal gaps* size_1, size_2 in
    [1, max_gap]; max_gap = 3 for train, 1 for eval
    (``vo/dataset/common.py:24-27,54-59``),
  - bilinear resize to (img_h, img_w),
  - per-scale intrinsics pyramid, 4 scales (``:65-75``),
  - ColorJitter(brightness=0.3, contrast=0.3, saturation=0.3, hue=0.2)
    applied with p=0.5 to the whole triplet identically (``:79-81``),
  - sample keys: flat ``source_left/target_image/source_right/K/inv_K``
    (NHWC numpy) plus the per-scale ``K_s`` / ``inv_K_s`` pyramid (string
    keys — jax pytrees need homogeneous dict key types, unlike the
    reference's tuple-keyed torch dicts).

TPU-first: decode/augment is pure numpy/cv2 on the host; batches are
prefetched to device by ``loader.device_prefetch`` — the torch DataLoader
worker-process machinery is replaced by a thread pool (decode releases the
GIL inside cv2/PIL).
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence, Tuple

import cv2
import numpy as np

NUM_SCALES = 4


def read_image_rgb(path: str, height: int, width: int) -> np.ndarray:
    """Decode + bilinear-resize to [H, W, 3] float32 in [0, 1]."""
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    if img.shape[:2] != (height, width):
        img = cv2.resize(img, (width, height), interpolation=cv2.INTER_LINEAR)
    return img.astype(np.float32) / 255.0


def color_jitter(
    images: np.ndarray,
    rng: np.random.Generator,
    brightness: float = 0.3,
    contrast: float = 0.3,
    saturation: float = 0.3,
    hue: float = 0.2,
) -> np.ndarray:
    """torchvision-style ColorJitter on a [N, H, W, 3] stack in [0, 1].

    One factor draw applied to every frame in the stack (the reference
    jitters the stacked triplet as one tensor, ``vo/dataset/common.py:79-81``).
    The on-device fast path (``training/augment.py``) applies the same
    formulas inside the train step; parity is pinned in tests.
    """
    b = rng.uniform(max(0.0, 1 - brightness), 1 + brightness)
    c = rng.uniform(max(0.0, 1 - contrast), 1 + contrast)
    s = rng.uniform(max(0.0, 1 - saturation), 1 + saturation)
    h = rng.uniform(-hue, hue)
    return apply_color_jitter_np(images, b, c, s, h)


def apply_color_jitter_np(
    images: np.ndarray, b: float, c: float, s: float, h: float
) -> np.ndarray:
    """Apply given jitter factors to a [N, H, W, 3] stack (host path)."""
    out = images * b
    mean = out.mean(axis=(1, 2, 3), keepdims=True)
    out = (out - mean) * c + mean
    gray = (
        0.299 * out[..., 0:1] + 0.587 * out[..., 1:2] + 0.114 * out[..., 2:3]
    )
    out = (out - gray) * s + gray
    out = np.clip(out, 0.0, 1.0).astype(np.float32)
    if abs(h) > 1e-6:
        for i in range(out.shape[0]):
            hsv = cv2.cvtColor(out[i], cv2.COLOR_RGB2HSV)
            hsv[..., 0] = (hsv[..., 0] + h * 360.0) % 360.0
            out[i] = cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)
    return np.clip(out, 0.0, 1.0)


def intrinsics_pyramid_np(K4: np.ndarray, num_scales: int = NUM_SCALES):
    """[(K, inv_K)] per scale; scale s halves the pixel rows s times."""
    out = []
    for s in range(num_scales):
        K = K4.copy()
        K[0, :] /= 2**s
        K[1, :] /= 2**s
        out.append((K.astype(np.float32), np.linalg.inv(K).astype(np.float32)))
    return out


class SnippetDataset:
    """Indexable 3-frame snippet source over one image sequence.

    Subclasses/callers provide ``rgb_paths`` (ordered frame paths) and a 4x4
    intrinsic (already scaled to the target resolution). ``poses`` (optional,
    camera-to-world) enables GT relative poses in eval mode, mirroring
    ``vo/dataset/redwood.py:93-137``.
    """

    def __init__(
        self,
        rgb_paths: Sequence[str],
        intrinsic: np.ndarray,
        image_size: Tuple[int, int],
        is_train: bool = True,
        augment: bool = True,
        poses: Optional[Sequence[np.ndarray]] = None,
        num_scales: int = NUM_SCALES,
    ):
        self.rgb_paths = list(rgb_paths)
        self.intrinsic = np.asarray(intrinsic, np.float32)
        self.image_size = image_size  # (H, W)
        self.is_train = is_train
        self.max_gap = 3 if is_train else 1
        self.augment = augment and is_train
        self.poses = list(poses) if poses is not None else None
        self.num_scales = num_scales
        self._pyramid = intrinsics_pyramid_np(self.intrinsic, num_scales)
        # output_uint8: ship snippets as uint8 [H, W, 3] and let the jitted
        # train step do the /255 scale ON DEVICE (training/steps.py) — 4x
        # fewer H2D bytes and no host astype per sample. Host jitter cannot
        # run on uint8; pair with Train.device_augment (the loader enforces
        # this). Enabled via ``Train.uint8_h2d``.
        self.output_uint8 = False

    def __len__(self) -> int:
        return max(0, len(self.rgb_paths) - 2 * self.max_gap)

    def _load(self, idx: int) -> np.ndarray:
        H, W = self.image_size
        return read_image_rgb(self.rgb_paths[idx], H, W)

    def _load_triplet(self, indices) -> np.ndarray:
        """Decode 3 frames; resize+normalize via the native C++ batch path
        (``native/preprocess.cpp``) when available, else per-image cv2."""
        H, W = self.image_size
        try:
            from deep_visual_slam_tpu.native import resize_normalize_batch

            raws = []
            for i in indices:
                img = cv2.imread(self.rgb_paths[i], cv2.IMREAD_COLOR)
                if img is None:
                    raise FileNotFoundError(self.rgb_paths[i])
                raws.append(img)
            if len({r.shape for r in raws}) == 1:
                out = resize_normalize_batch(
                    np.stack(raws), H, W, swap_rb=True  # BGR -> RGB fused
                )
                if out is not None:
                    return out
        except Exception:
            pass
        return np.stack([self._load(i) for i in indices])

    def _load_triplet_u8(self, indices) -> np.ndarray:
        """uint8 triplet: decode + resize WITHOUT the /255 normalize (the
        device does it — see ``output_uint8``). Half the host arithmetic
        and a quarter of the H2D bytes of the float path."""
        H, W = self.image_size
        frames = []
        for i in indices:
            img = cv2.imread(self.rgb_paths[i], cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(self.rgb_paths[i])
            img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if img.shape[:2] != (H, W):
                img = cv2.resize(img, (W, H), interpolation=cv2.INTER_LINEAR)
            frames.append(img)
        return np.stack(frames)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        if rng is None:
            rng = np.random.default_rng()
        size_1 = int(rng.integers(1, self.max_gap + 1))
        size_2 = int(rng.integers(1, self.max_gap + 1))
        left_idx = idx
        target_idx = idx + size_1
        right_idx = idx + size_1 + size_2

        if self.output_uint8:
            # Host jitter is impossible on uint8 — the loader disables
            # ``augment`` when it enables this path (device jitter applies
            # inside the train step instead).
            stack = self._load_triplet_u8([left_idx, target_idx, right_idx])
        else:
            stack = self._load_triplet([left_idx, target_idx, right_idx])
            if self.augment and rng.uniform() < 0.5:
                stack = color_jitter(stack, rng)

        sample: Dict = {
            "source_left": stack[0],
            "target_image": stack[1],
            "source_right": stack[2],
            "K": self._pyramid[0][0],
            "inv_K": self._pyramid[0][1],
        }
        for s in range(self.num_scales):
            sample[f"K_{s}"] = self._pyramid[s][0]
            sample[f"inv_K_{s}"] = self._pyramid[s][1]

        if not self.is_train and self.poses is not None:
            max_idx = len(self.poses) - 1
            t_i = min(target_idx, max_idx)
            r_i = min(right_idx, max_idx)
            p_l, p_t, p_r = (
                self.poses[left_idx],
                self.poses[t_i],
                self.poses[r_i],
            )
            # T_rel = inv(T_wc1) @ T_wc2 — source->target convention
            # (reference ``vo/dataset/redwood.py:93-105``).
            sample["gt_pose_left_to_target"] = (
                np.linalg.inv(p_l) @ p_t
            ).astype(np.float32)
            sample["gt_pose_target_to_right"] = (
                np.linalg.inv(p_t) @ p_r
            ).astype(np.float32)
            sample["frame_indices"] = np.array([left_idx, t_i, r_i], np.int64)
        return sample


class DepthSampleDataset:
    """Supervised-depth samples: RGB + 16-bit depth PNG -> meters + mask.

    Parity: reference ``depth/dataset/common.py:65-124`` — depth mm/1000,
    valid mask ``0 < d < max_depth``, horizontal-flip + jitter augmentation.
    """

    def __init__(
        self,
        rgb_paths: Sequence[str],
        depth_paths: Sequence[str],
        image_size: Tuple[int, int],
        max_depth: float = 10.0,
        is_train: bool = True,
        augment: bool = True,
        depth_scale: float = 1000.0,
    ):
        assert len(rgb_paths) == len(depth_paths)
        self.rgb_paths = list(rgb_paths)
        self.depth_paths = list(depth_paths)
        self.image_size = image_size
        self.max_depth = max_depth
        self.is_train = is_train
        self.augment = augment and is_train
        self.depth_scale = depth_scale

    def __len__(self) -> int:
        return len(self.rgb_paths)

    def __getitem__(self, idx: int, rng: Optional[np.random.Generator] = None):
        if rng is None:
            rng = np.random.default_rng()
        H, W = self.image_size
        rgb = read_image_rgb(self.rgb_paths[idx], H, W)
        depth_raw = cv2.imread(self.depth_paths[idx], cv2.IMREAD_UNCHANGED)
        if depth_raw is None:
            raise FileNotFoundError(self.depth_paths[idx])
        if depth_raw.shape[:2] != (H, W):
            depth_raw = cv2.resize(
                depth_raw, (W, H), interpolation=cv2.INTER_NEAREST
            )
        depth = depth_raw.astype(np.float32) / self.depth_scale

        if self.augment:
            if rng.uniform() < 0.5:
                rgb = rgb[:, ::-1].copy()
                depth = depth[:, ::-1].copy()
            if rng.uniform() < 0.5:
                rgb = color_jitter(rgb[None], rng)[0]

        valid = (depth > 0) & (depth < self.max_depth)
        return {
            "image": rgb,
            "depth": depth[..., None],
            "valid_mask": valid[..., None],
        }
