"""Synthetic scene generation for tests and benchmarks.

The reference has no test fixtures (SURVEY.md §4); golden geometry tests need
scenes with exactly known depth / pose / intrinsics. These generators render
photometrically consistent 3-frame snippets from a textured slanted plane
using the framework's own (independently unit-tested) warp ops, so the VO
loss has a known optimum at the true pose.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np
import jax.numpy as jnp

import contextlib
import functools

import jax

from deep_visual_slam_tpu.ops import (
    backproject,
    grid_sample,
    invert_se3,
    make_intrinsics,
    project,
    transformation_from_parameters,
)
from deep_visual_slam_tpu.ops.camera import make_intrinsics  # noqa: F811


def _on_cpu():
    """Context pinning jnp work to the host CPU.

    Data generation runs inside the input pipeline; letting its small
    jnp ops dispatch to the default accelerator serializes training on a
    remote/tunnelled chip (~100 ms RPC per op) and contends with the real
    train step on any chip.
    """
    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:  # no CPU backend (never in practice)
        return contextlib.nullcontext()


def _run_on_cpu(fn):
    """Decorator: run a generator function's jnp ops on the host CPU."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with _on_cpu():
            return fn(*args, **kwargs)

    return wrapper


def _box_blur_1d(x: np.ndarray, axis: int, k: int) -> np.ndarray:
    """Zero-padded 'same' box filter along ``axis`` via cumulative sums —
    vectorized (the previous np.apply_along_axis/np.convolve version looped
    in Python per row and dominated synthetic-data training on a 1-core
    host)."""
    h = k // 2
    x = np.moveaxis(x, axis, -1)
    pad = np.zeros(x.shape[:-1] + (x.shape[-1] + k,), np.float64)
    pad[..., h + 1 : h + 1 + x.shape[-1]] = x
    cs = np.cumsum(pad, axis=-1)
    out = (cs[..., k:] - cs[..., :-k]) / k
    return np.moveaxis(out.astype(np.float32), -1, axis)


def smooth_texture(
    rng: np.random.Generator, batch: int, height: int, width: int, sigma: int = 4
) -> np.ndarray:
    """Band-limited random RGB texture in [0, 1] (bilinear-friendly)."""
    base = rng.uniform(size=(batch, height, width, 3)).astype(np.float32)
    k = 2 * sigma + 1
    for axis in (1, 2):
        base = _box_blur_1d(base, axis, k)
    lo = base.min(axis=(1, 2, 3), keepdims=True)
    hi = base.max(axis=(1, 2, 3), keepdims=True)
    return (base - lo) / np.maximum(hi - lo, 1e-6)


def plane_depth(
    batch: int, height: int, width: int, z0: float = 2.0, slope: float = 0.3
) -> np.ndarray:
    """Slanted-plane depth map in meters: z = z0 + slope * (v/H - 0.5)."""
    v = np.linspace(-0.5, 0.5, height, dtype=np.float32)[None, :, None]
    return np.broadcast_to(z0 + slope * v, (batch, height, width)).copy()


def default_intrinsics(height: int, width: int) -> np.ndarray:
    """Redwood-style intrinsics rescaled to the target size
    (fx=fy=525 at 640x480, reference ``README.md:135-138``)."""
    fx = 525.0 * width / 640.0
    fy = 525.0 * height / 480.0
    cx = (width - 1) / 2.0
    cy = (height - 1) / 2.0
    return np.asarray(make_intrinsics(fx, fy, cx, cy))


@_run_on_cpu
def synthetic_vo_batch(
    seed: int,
    batch_size: int,
    height: int,
    width: int,
    max_translation: float = 0.05,
    max_rotation: float = 0.01,
) -> Tuple[Dict[str, jnp.ndarray], Dict[str, jnp.ndarray]]:
    """Photometrically consistent (left, target, right) snippet batch.

    Returns (batch, truth) where ``batch`` feeds the VO loss
    (keys: source_left/target_image/source_right/K/inv_K) and ``truth``
    carries the generating poses ``T_left`` (left<-target... specifically
    target->left) and ``T_right`` (target->right) plus the depth map.
    """
    rng = np.random.default_rng(seed)
    target = jnp.asarray(smooth_texture(rng, batch_size, height, width))
    depth = jnp.asarray(plane_depth(batch_size, height, width))
    K = jnp.asarray(
        np.broadcast_to(default_intrinsics(height, width), (batch_size, 4, 4))
    )
    inv_K = jnp.linalg.inv(K)

    def rand_pose():
        aa = jnp.asarray(
            rng.uniform(-max_rotation, max_rotation, size=(batch_size, 3)).astype(np.float32)
        )
        t = jnp.asarray(
            rng.uniform(-max_translation, max_translation, size=(batch_size, 3)).astype(np.float32)
        )
        return transformation_from_parameters(aa, t)

    # T maps target-frame points into the source camera frame; rendering the
    # source view = sampling the target image at the *inverse* warp.
    T_left = rand_pose()
    T_right = rand_pose()

    pts = backproject(depth, inv_K)

    def render(T):
        grid = project(pts, K, T)
        return grid_sample(target, grid, align_corners=True, padding_mode="border")

    # Note: this renders source as the target texture seen through T — exact
    # for the planar scene away from image borders.
    source_left = render(invert_se3(T_left))
    source_right = render(invert_se3(T_right))

    batch = {
        "source_left": source_left,
        "target_image": target,
        "source_right": source_right,
        "K": K,
        "inv_K": inv_K,
    }
    truth = {"T_left": T_left, "T_right": T_right, "depth": depth}
    return batch, truth


class SyntheticStereoDataset:
    """Rendered stereo pairs with exactly-known baseline pose.

    Emits ``{source_image, target_image, intrinsic, pose}`` in the
    ``StereoSnippetDataset`` schema; ``pose`` maps TARGET-frame points into
    the SOURCE camera (the warp convention of
    ``vo_learner.process_stereo_batch``), so the photometric optimum is at
    the true depth.
    """

    def __init__(
        self,
        image_size: Tuple[int, int],
        length: int = 64,
        baseline: float = 0.1,
        seed: int = 0,
        is_train: bool = True,
    ):
        self.image_size = image_size
        self.length = length
        self.baseline = baseline
        self.seed = seed
        self.is_train = is_train

    def __len__(self) -> int:
        return self.length

    @_run_on_cpu
    def __getitem__(self, idx: int, rng=None) -> Dict:
        H, W = self.image_size
        rng = np.random.default_rng((self.seed, idx))
        target = smooth_texture(rng, 1, H, W)
        depth = plane_depth(1, H, W, z0=float(rng.uniform(1.5, 3.0)))
        K = jnp.asarray(default_intrinsics(H, W))[None]
        inv_K = jnp.linalg.inv(K)

        # Rectified pair: source camera at +baseline along x in the target
        # frame => target-frame points land at x - b in source coords.
        T = np.eye(4, dtype=np.float32)
        T[0, 3] = -self.baseline
        pts = backproject(jnp.asarray(depth), inv_K)
        grid = project(pts, K, invert_se3(jnp.asarray(T)[None]))
        source = grid_sample(
            jnp.asarray(target), grid, align_corners=True,
            padding_mode="border",
        )
        return {
            "source_image": np.asarray(source[0], np.float32),
            "target_image": target[0].astype(np.float32),
            "intrinsic": np.asarray(K[0], np.float32),
            "pose": T,
            # ground-truth plane depth (extra key; the stereo step ignores
            # it, tests/eval use it)
            "depth": depth[0].astype(np.float32),
        }


@_run_on_cpu
def synthetic_slam_sequence(
    n_frames: int,
    height: int,
    width: int,
    seed: int = 0,
    step_translation: float = 0.01,
    step_rotation: float = 0.002,
    distractor: "str | None" = None,
    flicker_amp: float = 0.3,
):
    """Temporally coherent camera sweep for SLAM-loop benchmarks/tests.

    Returns (frames [N, H, W, 3] float32 in [0,1], K [4,4], gt_poses
    [N, 4, 4] global T_cw). Unlike :func:`smooth_texture` snippets, the
    texture is high-contrast (blocky + smooth mix) so ORB finds and matches
    corners; each frame is the slanted plane seen along a smooth random-walk
    camera path (inverse-warp render, exact for the planar scene away from
    borders — same scheme as :func:`synthetic_vo_batch`).

    ``distractor="flicker"`` replaces a rectangular patch of the plane with
    :func:`_distractor_texture` whose gain swings by ``±flicker_amp``
    independently per frame — the photometric-violation fixture for
    uncertainty training (the scene geometry is untouched; only constancy
    breaks, exactly in the distinctively textured region). The return then
    gains a 4th element ``masks [N, H, W] bool`` (pixels sampling the
    patch). The ``"moving"`` distractor needs real occlusion and lives in
    :func:`synthetic_multidepth_sequence` only.
    """
    if distractor not in (None, "none", "flicker"):
        raise ValueError(
            f"slam_sequence distractor must be 'flicker' (got {distractor!r})"
        )
    if distractor == "none":
        distractor = None
    rng = np.random.default_rng(seed)
    # Blocky high-contrast texture: 8x8 cells + smooth shading.
    cells = rng.uniform(size=(height // 8 + 1, width // 8 + 1, 3)).astype(np.float32)
    blocky = np.repeat(np.repeat(cells, 8, axis=0), 8, axis=1)[:height, :width]
    tex = 0.75 * blocky + 0.25 * smooth_texture(rng, 1, height, width)[0]

    patch = None
    if distractor:
        drng = np.random.default_rng(seed * 7919 + 13)
        gains = 1.0 + flicker_amp * drng.uniform(-1, 1, size=n_frames)
        r0, r1 = int(0.15 * height), int(0.45 * height)
        c0, c1 = int(0.55 * width), int(0.85 * width)
        jj, ii = np.meshgrid(np.arange(c0, c1), np.arange(r0, r1))
        # ~12 px checker period at any resolution (coords in units of
        # 0.005*px against the 0.06 world cell).
        patch = _distractor_texture(jj * 0.005, ii * 0.005)
        patch_mask = np.zeros((1, height, width, 1), np.float32)
        patch_mask[0, r0:r1, c0:c1, 0] = 1.0
        mask_dev = jnp.asarray(patch_mask)

    def tex_for(i):
        if patch is None:
            return tex
        t = tex.copy()
        t[r0:r1, c0:c1] = np.clip(patch * gains[i], 0.0, 1.0)
        return t

    target = jnp.asarray(tex_for(0)[None])

    depth = jnp.asarray(plane_depth(1, height, width))
    K_np = default_intrinsics(height, width)
    K = jnp.asarray(K_np[None])
    inv_K = jnp.linalg.inv(K)
    pts = backproject(depth, inv_K)

    frames = [np.asarray(target[0])]
    poses = [np.eye(4, dtype=np.float32)]
    masks = [np.asarray(patch_mask[0, ..., 0] > 0.5)] if distractor else None
    T_cw = jnp.eye(4)[None]
    for i in range(1, n_frames):
        aa = jnp.asarray(
            rng.uniform(-step_rotation, step_rotation, size=(1, 3)).astype(np.float32)
        )
        t = jnp.asarray(
            rng.uniform(-step_translation, step_translation, size=(1, 3)).astype(np.float32)
        )
        T_rel = transformation_from_parameters(aa, t)  # prev -> cur camera
        T_cw = T_rel @ T_cw
        grid = project(pts, K, invert_se3(T_cw))
        if distractor:
            target = jnp.asarray(tex_for(i)[None])
        view = grid_sample(target, grid, align_corners=True, padding_mode="border")
        frames.append(np.asarray(view[0]))
        poses.append(np.asarray(T_cw[0], np.float32))
        if distractor:
            m = grid_sample(
                mask_dev, grid, align_corners=True, padding_mode="zeros"
            )
            masks.append(np.asarray(m[0, ..., 0]) > 0.5)
    out = (
        np.stack(frames).astype(np.float32),
        K_np.astype(np.float32),
        np.stack(poses),
    )
    if distractor:
        return out + (np.stack(masks),)
    return out


def _distractor_texture(x: np.ndarray, y: np.ndarray, cell: float = 0.06) -> np.ndarray:
    """High-contrast magenta/green checker over world (x, y) — the
    photometric-DISTRACTOR texture. Visually distinct from every other
    fixture texture (``_cell_texture`` hashes, ``smooth_texture`` blobs),
    so a learned uncertainty head can key on appearance alone: wherever
    this texture appears, the rendered sequence violates photometric
    constancy (per-frame gain flicker or rigid motion), exactly the
    image regions D3VO's uncertainty head exists to down-weight
    (reference ``slam/optimizer.py:126,179`` stores the weights; its
    runnable path feeds zeros)."""
    u, v = x / cell, y / cell
    iu, iv = np.floor(u), np.floor(v)
    fu, fv = u - iu, v - iv
    # Continuous (sharpened) checker — pointwise-sampled hard steps would
    # make even the STATIC rendering photometrically inconsistent.
    su = np.clip((fu - 0.4) / 0.2, 0.0, 1.0)
    sv = np.clip((fv - 0.4) / 0.2, 0.0, 1.0)
    par = (iu + iv) % 2
    t = par + (1 - 2 * par) * (su + sv - 2 * su * sv)
    t = np.asarray(t, np.float32)[..., None]
    magenta = np.array([0.95, 0.08, 0.90], np.float32)
    green = np.array([0.08, 0.90, 0.15], np.float32)
    return t * magenta + (1.0 - t) * green


def _hash_cells(ix: np.ndarray, iy: np.ndarray, salt: float) -> np.ndarray:
    """Deterministic pseudo-random RGB per integer cell (GLSL-style trig
    hash) — evaluable at ANY cell index with no stored texture raster."""
    out = []
    for k, mul in enumerate((12.9898, 39.3468, 73.156)):
        v = np.sin(ix * mul + iy * (78.233 + 11.0 * k) + salt * 37.719) * 43758.5453
        out.append(v - np.floor(v))
    return np.stack(out, axis=-1).astype(np.float32)


def _cell_texture(x: np.ndarray, y: np.ndarray, salt: float, cell: float) -> np.ndarray:
    """Continuous high-contrast 'blocky' texture over world (x, y): bilinear
    mix of hashed cell colors with a sharpened (but continuous) transition —
    corners at every cell junction for the tracker, zero aliasing for the
    photometric losses (a hard step sampled pointwise would make the frames
    photometrically inconsistent at block edges)."""
    u, v = x / cell, y / cell
    iu, iv = np.floor(u), np.floor(v)
    fu, fv = u - iu, v - iv
    su = np.clip((fu - 0.35) / 0.3, 0.0, 1.0)[..., None]
    sv = np.clip((fv - 0.35) / 0.3, 0.0, 1.0)[..., None]
    c00 = _hash_cells(iu, iv, salt)
    c01 = _hash_cells(iu + 1, iv, salt)
    c10 = _hash_cells(iu, iv + 1, salt)
    c11 = _hash_cells(iu + 1, iv + 1, salt)
    top = c00 * (1 - su) + c01 * su
    bot = c10 * (1 - su) + c11 * su
    return top * (1 - sv) + bot * sv


@_run_on_cpu
def synthetic_multidepth_sequence(
    n_frames: int,
    height: int,
    width: int,
    seed: int = 0,
    step_translation: float = 0.01,
    step_rotation: float = 0.002,
    distractor: "str | None" = None,
    flicker_amp: float = 0.3,
    move_amp: float = 0.18,
):
    """Ray-cast camera sweep over a PIECEWISE-PLANAR scene: a background
    plane plus raised foreground slabs at distinct depths, every frame an
    exact analytic render (per-pixel ray/plane intersection + z-buffer,
    texture evaluated at the world hit point — no warp, no interpolation
    error).

    Unlike :func:`synthetic_slam_sequence`'s single slanted plane — whose
    (pose, depth) photometric cost has a flat plane-induced-homography
    gauge family, making bundle adjustment unidentifiable — depth
    discontinuities pin the geometry, so BA ablations on these scenes
    measure real accuracy, not gauge drift. Returns
    ``(frames [N, H, W, 3], K [4, 4], gt_T_cw [N, 4, 4],
    depths [N, H, W])`` with exact metric GT depth per frame.

    ``distractor`` adds a photometric-violation slab textured with
    :func:`_distractor_texture` (the fixture behind the D3VO uncertainty
    path — reference ``slam/optimizer.py:126,179`` weights, fed zeros by
    its runnable driver):

      - ``"flicker"``: the slab's gain swings by ``±flicker_amp``
        independently per frame (exposure/specular-style violation);
      - ``"moving"``: the slab translates along world x on a smooth cycle
        of amplitude ``move_amp`` meters (dynamic-object violation; its
        texture rides the slab, GT depth includes the object where it
        ACTUALLY is each frame, but camera-only geometry cannot explain
        its pixels).

    With a distractor the return gains a 5th element ``masks
    [N, H, W] bool`` — pixels rendered from the distractor slab (the
    oracle uncertainty region for ablations).
    """
    if distractor not in (None, "none", "flicker", "moving"):
        raise ValueError(f"unknown distractor {distractor!r}")
    if distractor == "none":
        distractor = None
    rng = np.random.default_rng(seed)
    K = default_intrinsics(height, width)
    fx, fy, cx, cy = K[0, 0], K[1, 1], K[0, 2], K[1, 2]

    # Scene in the frame-0 camera frame (= world): fronto-parallel
    # background + 3 foreground slabs. (x0, x1, y0, y1, z, cell, salt);
    # background bounds are infinite.
    inf = np.inf
    slabs = [
        (-inf, inf, -inf, inf, 3.2, 0.14, 1.0),
        (-1.3, -0.15, -1.0, 0.35, 1.9, 0.09, 2.0),
        (0.2, 1.5, -0.45, 1.0, 2.5, 0.11, 3.0),
        (-0.5, 0.45, 0.5, 1.6, 1.6, 0.08, 4.0),
    ]
    # Distractor slab: in front of the background, clear of the three
    # static foreground slabs, near the image center at frame 0.
    D_BOUNDS = (-0.05, 0.75, -1.05, -0.3)
    D_Z = 2.2
    if distractor:
        drng = np.random.default_rng(seed * 7919 + 13)
        gains = 1.0 + flicker_amp * drng.uniform(-1, 1, size=n_frames)
        # Smooth one-cycle sweep; per-frame offset is deterministic in i.
        offsets = move_amp * np.sin(
            2 * np.pi * np.arange(n_frames) / max(n_frames - 1, 1)
        )

    u, v = np.meshgrid(
        np.arange(width, dtype=np.float64), np.arange(height, dtype=np.float64)
    )
    d_cam = np.stack([(u - cx) / fx, (v - cy) / fy, np.ones_like(u)], -1)

    frames, depths, poses, masks = [], [], [], []
    T_cw = np.eye(4, dtype=np.float64)
    for i in range(n_frames):
        if i:
            aa = rng.uniform(-step_rotation, step_rotation, size=(1, 3)).astype(
                np.float32
            )
            t = rng.uniform(-step_translation, step_translation, size=(1, 3)).astype(
                np.float32
            )
            T_rel = np.asarray(
                transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t))
            )[0].astype(np.float64)
            T_cw = T_rel @ T_cw
        T_wc = np.linalg.inv(T_cw)
        C = T_wc[:3, 3]
        d_w = d_cam @ T_wc[:3, :3].T  # world ray dirs; |d_cam.z| = 1 => lam = cam depth

        frame_slabs = list(slabs)
        if distractor:
            ox = offsets[i] if distractor == "moving" else 0.0
            x0, x1, y0, y1 = D_BOUNDS
            frame_slabs.append(
                (x0 + ox, x1 + ox, y0, y1, D_Z, "distractor", ox)
            )

        best_lam = np.full((height, width), 1e6)
        img = np.zeros((height, width, 3), np.float32)
        dmask = np.zeros((height, width), bool)
        for (x0, x1, y0, y1, z0, cell, salt) in frame_slabs:
            dz = d_w[..., 2]
            lam = (z0 - C[2]) / np.where(np.abs(dz) < 1e-9, 1e-9, dz)
            Xx = C[0] + lam * d_w[..., 0]
            Xy = C[1] + lam * d_w[..., 1]
            hit = (
                (lam > 1e-3)
                & (lam < best_lam)
                & (Xx >= x0) & (Xx <= x1) & (Xy >= y0) & (Xy <= y1)
            )
            if not hit.any():
                if cell == "distractor":
                    dmask &= False
                continue
            if cell == "distractor":
                # Texture rides the slab (subtract the motion offset) so a
                # moving distractor looks rigid; flicker scales the gain.
                tex = _distractor_texture(Xx[hit] - salt, Xy[hit])
                if distractor == "flicker":
                    tex = np.clip(tex * gains[i], 0.0, 1.0)
                dmask = hit  # z-buffer: later slabs never overwrite these
            else:
                tex = _cell_texture(Xx[hit], Xy[hit], salt, cell)
            img[hit] = tex
            best_lam = np.where(hit, lam, best_lam)
        frames.append(img)
        depths.append(best_lam.astype(np.float32))
        poses.append(T_cw.astype(np.float32).copy())
        masks.append(dmask)

    out = (
        np.stack(frames),
        K.astype(np.float32),
        np.stack(poses),
        np.stack(depths),
    )
    if distractor:
        return out + (np.stack(masks),)
    return out


class SyntheticVoDataset:
    """Indexable synthetic snippet dataset with the SnippetDataset interface.

    Each item is an independently seeded photometrically consistent triplet;
    eval mode attaches the generating GT relative poses with the same keys as
    the Redwood eval path.
    """

    def __init__(
        self,
        image_size,
        length: int = 256,
        seed: int = 0,
        is_train: bool = True,
    ):
        self.image_size = image_size
        self.length = length
        self.seed = seed
        self.is_train = is_train

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int, rng=None) -> Dict:
        H, W = self.image_size
        batch, truth = synthetic_vo_batch(self.seed * 100003 + idx, 1, H, W)
        sample = {k: np.asarray(v[0]) for k, v in batch.items()}
        K = sample["K"]
        for s in range(4):
            Ks = K.copy()
            Ks[0, :] /= 2**s
            Ks[1, :] /= 2**s
            sample[f"K_{s}"] = Ks
            sample[f"inv_K_{s}"] = np.linalg.inv(Ks).astype(np.float32)
        if not self.is_train:
            # truth["T_left"] maps target->left = inv(left<-target)... the GT
            # eval convention is source->target for the left pair:
            sample["gt_pose_left_to_target"] = np.asarray(
                jnp.linalg.inv(truth["T_left"][0])
            )
            sample["gt_pose_target_to_right"] = np.asarray(truth["T_right"][0])
            sample["frame_indices"] = np.array([idx, idx + 1, idx + 2])
        return sample


@_run_on_cpu
def synthetic_depth_batch(
    seed: int, batch_size: int, height: int, width: int, max_depth: float = 10.0
) -> Dict[str, jnp.ndarray]:
    """Supervised-depth sample: image + metric depth + validity mask."""
    rng = np.random.default_rng(seed)
    image = jnp.asarray(smooth_texture(rng, batch_size, height, width))
    depth = jnp.asarray(plane_depth(batch_size, height, width))[..., None]
    valid = (depth > 0) & (depth < max_depth)
    return {"image": image, "depth": depth, "valid_mask": valid}
