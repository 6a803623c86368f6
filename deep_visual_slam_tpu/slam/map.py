"""Keyframe map + backend driver over the JAX photometric BA.

Parity target: reference ``slam/optimizer.py`` (``Map``):
  - keyframe decision score ``0.6 * f + 0.4 * ft > 1`` from mean keypoint
    displacement and rotation-compensated displacement (``:59-97``),
  - window of ``num_kf = 7`` keyframes, oldest marginalized when the window
    is full (``:41-56,314-319``),
  - windowed photometric BA over (pose, point-depth) vertices with D3VO
    uncertainty weights ``alpha^2 / (alpha^2 + sqrt(unc)^2)`` and Huber,
    6 LM iterations (``:222-319``),
  - ``global_bundle_adjustment``: same graph over ALL keyframes, 20 iters run
    in 3 stages (``:99-220``),
  - ``relative_to_global`` pose composition (``:348-356``) and ``keypoints``
    connectivity collection (``:321-346``).

TPU-native: instead of mutating a C++ hypergraph per edge, the map gathers a
FIXED-SHAPE ``BAProblem`` (F keyframes x P point slots, padded) and calls the
jitted LM solver; the padded problem shape means one compiled program serves
every window. Points are padded to ``max_points``; extra tracks are dropped
by track length (longest kept).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from deep_visual_slam_tpu.slam.ba import (
    BAProblem,
    photometric_ba,
    photometric_ba_pyramid,
)
from deep_visual_slam_tpu.slam.frontend import Frame, Point, match_frame_kps


class Map:
    def __init__(
        self,
        alpha: float = 0.5,
        num_kf: int = 7,
        max_points: int = 256,
        ba_levels: Tuple[int, ...] = (2, 1),
        depth_damping: float = 1.0,
        pose_prior_weight: float = 1e3,
        estimate_affine: bool = False,
        huber_delta: float = 0.11,
    ):
        self.frames: List[Frame] = []
        self.points: List[Point] = []
        self.keyframes: List[Frame] = []
        self.frame_idx = 0
        self.pt_idx = 0
        self.num_kf = num_kf
        self.alpha = alpha
        self.max_points = max_points
        # BA pyramid levels, coarsest first. Default (2, 1) is the
        # ablation-validated configuration (BASELINE.md: ATE −41% at
        # oracle init, docs/ba_ablation_r03.json) — the 2x level widens
        # the bilinear basin to ~2 px of initial flow at the cost of one
        # extra device dispatch per solve. (1,) is the reference regime
        # (single-scale, trained nets put the init inside the basin);
        # (4, 2, 1) converges from ~4x larger initial flow (see
        # ``ba.photometric_ba_pyramid``).
        self.ba_levels = tuple(ba_levels)
        # Depth-Hessian floor for the windowed/global solves. 1.0 treats the
        # network depth as a strong prior (the D3VO regime): at SLAM window
        # baselines per-point depth is photometrically identifiable only to
        # ~0.3 m/px and near-periodic texture aliases, so free depths (0.0)
        # measurably WORSEN poses while 1.0 improves them ~3x — see the
        # ``photometric_ba`` docstring and docs/ba_ablation_r03.json.
        self.depth_damping = float(depth_damping)
        # Odometry relative-pose prior weight (D3VO Eq. 15: the network
        # pose is an edge, not just the init). 1e3 measured best on both
        # the oracle ablation and the captured runaway window — see the
        # ``photometric_ba`` docstring for the failure it closes (a
        # weakly-observed frame taking an accepted 1.5 m aliased step).
        self.pose_prior_weight = float(pose_prior_weight)
        # Estimate a per-frame brightness affine (gain, bias) inside the
        # windowed solve (ba.photometric_ba ``estimate_affine``) — the
        # D3VO capability the reference stores but never exercises
        # (``slam/MonoVO.py:19-27`` feeds a=1, b=0). Off by default: it
        # costs 2 extra columns per frame and only pays under exposure
        # changes (see docs/ba_affine_r05.json).
        self.estimate_affine = bool(estimate_affine)
        # Photometric Huber threshold ([0,1] intensity units; reference
        # RobustKernelHuber delta, slam/optimizer.py:287). Exposed for the
        # prior-weight/robustness Pareto sweep (docs/prior_pareto_r05.json).
        self.huber_delta = float(huber_delta)
        # Accumulated host wall time spent assembling BA problems (its own
        # bucket: it is host work a local chip cannot hide, unlike the
        # pipelined device solve).
        self.build_s = 0.0
        # Device-resident image cache keyed by frame id: keyframe images are
        # uploaded once, not re-transferred on every windowed-BA call (25 MB
        # per call at 640x480xF=7 otherwise — the dominant cost over a
        # remote-TPU link). Evicted when a frame leaves the keyframe set.
        self._dev_images: Dict[int, "jnp.ndarray"] = {}
        # In-flight windowed BA (pipelined mode): (window, points, poses,
        # depths) device results not yet written back to host state.
        self._pending_ba = None
        # 3x3 intrinsics for the keyframe score's rotation-flow homography
        # (K R K^-1); set by the MonoVO driver. None falls back to the
        # reference's bare R-on-pixels form, a BUG upstream
        # (optimizer.py:76,86): the perspective division then scales with
        # pixel magnitude, inflating ft ~50x and forcing every frame to be
        # a keyframe (documented in README).
        self.intrinsic3: "np.ndarray | None" = None

    # ------------------------------------------------------------- registry
    def add_frame(self, frame) -> int:
        ret = self.frame_idx
        self.frame_idx += 1
        self.frames.append(frame)
        return ret

    def add_point(self, pt) -> int:
        ret = self.pt_idx
        self.pt_idx += 1
        self.points.append(pt)
        return ret

    # ----------------------------------------------------------- keyframes
    def check_add_key_frame(self, frame: Frame, match_from_prev=None) -> bool:
        """Keyframe policy + window marginalization (reference ``:41-56``).

        ``match_from_prev`` optionally carries the already-computed
        ``match_frame_kps(frames[-2], frame)`` result so the score doesn't
        re-run the O(N^2) KNN match when the last keyframe IS the previous
        frame (the common case).
        """
        key_frame = frame.id == 0 or self.check_key_frame(frame, match_from_prev)
        if key_frame:
            self.register_keyframe(frame)
        elif self.keyframes:
            frame.set_anchor(self.keyframes[-1])
        return key_frame

    def register_keyframe(self, frame: Frame) -> None:
        """Append a frame to the keyframe window and flag the head for
        marginalization when full — the policy-independent half of
        ``check_add_key_frame`` (also used by the KLT frontend, whose
        keyframe score comes from tracked displacements, not matching)."""
        frame.set_anchor(frame)
        self.keyframes.append(frame)
        if len(self.keyframes) >= self.num_kf:
            self.keyframes[0].marginalize = True

    def check_key_frame(self, frame: Frame, match_from_prev=None) -> bool:
        """Score ``0.6 * f + 0.4 * ft > 1`` (reference ``:59-97``):
        f  = RMS keypoint displacement vs the last keyframe,
        ft = RMS displacement after removing relative rotation (homography
             ``R1 @ R2^-1``), i.e. the translation-induced flow."""
        last_kf = self.keyframes[-1]
        if (
            match_from_prev is not None
            and len(self.frames) >= 2
            and last_kf is self.frames[-2]
        ):
            l1, l2 = match_from_prev
        else:
            l1, l2 = match_frame_kps(last_kf, frame)
        if not l1:
            return True  # lost tracking -> force a keyframe
        R1 = last_kf.pose[:3, :3]
        R2 = frame.pose[:3, :3]
        homography_t = R1 @ np.linalg.inv(R2)
        if self.intrinsic3 is not None:
            # Pixel-space rotation homography K R K^-1 (see __init__ note
            # on the reference's bare-R bug).
            homography_t = (
                self.intrinsic3 @ homography_t
                @ np.linalg.inv(self.intrinsic3)
            )

        f = 0.0
        ft = 0.0
        for i1, i2 in zip(l1, l2):
            x1, y1 = last_kf.kps[i1]
            x2, y2 = frame.kps[i2]
            f += (x1 - x2) ** 2 + (y1 - y2) ** 2
            p = homography_t @ np.array([x2, y2, 1.0])
            ft += (x1 - p[0] / p[2]) ** 2 + (y1 - p[1] / p[2]) ** 2
        f = np.sqrt(f / len(l1))
        ft = np.sqrt(ft / len(l1))
        return 0.6 * f + 0.4 * ft > 1.0

    # ------------------------------------------------------------ geometry
    def relative_to_global(self) -> List[np.ndarray]:
        """Global poses of all frames (frames store T_cw already; kept for
        API parity with reference ``:348-356``). Non-keyframes are refreshed
        against their anchor keyframe's BA-corrected pose."""
        self.flush_ba()
        return [f.current_pose() for f in self.frames]

    def keypoints(self, frames: Optional[List[Frame]] = None) -> Dict[Point, List[Tuple[Frame, int]]]:
        """Points visible in >= 2 of the given keyframes, with their
        (frame, kp-index) observations (reference ``:321-346``)."""
        frames = self.keyframes if frames is None else frames
        frame_set = set(id(f) for f in frames)
        out: Dict[Point, List[Tuple[Frame, int]]] = {}
        seen = set()
        for f in frames:
            for pt in f.pts.values():
                if not pt.valid or id(pt) in seen:
                    continue
                seen.add(id(pt))
                local = [
                    (fr, idx)
                    for fr, idx in zip(pt.frames, pt.idxs)
                    if id(fr) in frame_set
                ]
                if len(local) > 1:
                    out[pt] = local
        return out

    # ------------------------------------------------------------- backend
    def _device_image(self, f: Frame) -> "jnp.ndarray":
        """Frame image as a cached on-device [H, W, 3] fp32 array with the
        brightness affine applied (uploaded at most once per frame)."""
        cached = self._dev_images.get(f.id)
        if cached is None:
            img = np.asarray(f.image, np.float32)
            if f.image.dtype == np.uint8:  # uint8 ingest: photometric [0,1]
                img = img / 255.0
            if img.ndim == 2:
                img = np.repeat(img[..., None], 3, axis=-1)
            cached = jnp.asarray(f.a * img + f.b)
            self._dev_images[f.id] = cached
        return cached

    def _zero_image(self, H: int, W: int, dtype=jnp.float32) -> "jnp.ndarray":
        """Cached on-device zero image for padded window slots (uploaded
        once per (size, dtype), not once per keyframe). dtype follows the
        window's cached images so the solver's in-jit stack is homogeneous
        (uint8 under the low-H2D ingest path)."""
        cached = getattr(self, "_zero_img_cache", None)
        if cached is None or cached.shape[:2] != (H, W) or cached.dtype != dtype:
            cached = jnp.zeros((H, W, 3), dtype)
            self._zero_img_cache = cached
        return cached

    def register_device_image(self, frame_id: int, image: "jnp.ndarray") -> None:
        """Pre-seed the device cache (e.g. with the array already uploaded
        for network inference). Only valid for a=1, b=0 frames.

        Evicts immediately: only keyframe images are ever read by the BA
        backend, and eviction must not wait for ``optimize()`` (a sequence
        that adds no keyframes would otherwise grow device memory by one
        full image per processed frame, unbounded)."""
        self._dev_images[frame_id] = image
        self._evict_device_images(extra_live={frame_id})

    def _evict_device_images(self, extra_live=()) -> None:
        live = {f.id for f in self.keyframes} | set(extra_live)
        for fid in [k for k in self._dev_images if k not in live]:
            del self._dev_images[fid]

    def _gather_tracks_fast(self, frames: List[Frame], max_points: int):
        """Array-based track gather from the KLT frontend's per-keyframe
        slot->Point-id snapshots (``Frame.slot_pt_id``), replacing the
        per-Point python walk of :meth:`keypoints` + the per-track build
        loop (~4 ms/keyframe at P=256 on a 1-core host; this path is
        ~100 us). Returns ``(points, host_uv [n,2], host_idx [n],
        depth [n], unc [n], obs [n, F_real])`` with tracks ordered longest
        first, or None when any window frame lacks a snapshot (ORB path)."""
        snaps = [getattr(f, "slot_pt_id", None) for f in frames]
        if any(s is None for s in snaps):
            return None
        F_real = len(frames)
        M = np.stack(snaps)  # [F_real, S] point id per slot, -1 = empty
        uids, inv = np.unique(M, return_inverse=True)
        inv = inv.reshape(M.shape)
        obs_full = np.zeros((len(uids), F_real), bool)
        obs_full[inv, np.arange(F_real)[:, None]] = True
        # A Point lives in ONE slot for its whole life (re-hosting creates a
        # new Point), so any occurrence gives its slot.
        slot_arr = np.zeros(len(uids), np.int64)
        slot_arr[inv] = np.broadcast_to(
            np.arange(M.shape[1]), M.shape
        )
        n_obs = obs_full.sum(1)
        valid = np.array(
            [u >= 0 and self.points[u].valid for u in uids], bool
        )
        keep = valid & (n_obs >= 2)
        if not keep.any():
            return [], None, None, None, None, None
        # Longest tracks first; fixed point budget.
        order = np.flatnonzero(keep)[np.argsort(-n_obs[keep], kind="stable")]
        order = order[:max_points]

        host_f = obs_full[order].argmax(1)  # first observation = host
        slots = slot_arr[order]
        kps_all = np.stack([f.kps for f in frames])  # [F_real, S, 2] int
        uv = kps_all[host_f, slots].astype(np.float32)
        depth = np.empty(len(order), np.float32)
        unc = np.empty(len(order), np.float32)
        xs = uv[:, 0].astype(np.int64)
        ys = uv[:, 1].astype(np.int64)
        for fi, f in enumerate(frames):
            sel = host_f == fi
            if sel.any():
                depth[sel] = f.depth[ys[sel], xs[sel]]
                unc[sel] = f.uncertainty[ys[sel], xs[sel]]
        points = [self.points[u] for u in uids[order]]
        return (
            points, uv, host_f.astype(np.int32), depth, unc, obs_full[order]
        )

    def _build_problem(
        self,
        intrinsic: np.ndarray,
        frames: List[Frame],
        max_points: int,
        pad_frames: Optional[int] = None,
    ) -> Optional[Tuple[BAProblem, List[Point]]]:
        """Gather the fixed-shape BAProblem.

        ``pad_frames``: pad the frame axis to this size with identity-pose /
        zero-image / zero-observation slots, so the windowed solver compiles
        ONE program regardless of how full the window is (while the window
        grows 2..num_kf, varying F would otherwise trigger a ~8 s XLA compile
        per size). Padded slots get zero Hessian rows; LM damping keeps the
        system solvable and their updates are exactly zero.
        """
        F_real = len(frames)
        F = max(pad_frames or F_real, F_real)
        H, W = frames[0].image.shape[:2]
        P = max_points

        host_uv = np.zeros((P, 2), np.float32)
        host_idx = np.zeros(P, np.int32)
        depths = np.full(P, 1.0, np.float32)
        obs = np.zeros((P, F), bool)
        weight = np.zeros(P, np.float32)

        fast = self._gather_tracks_fast(frames, max_points)
        if fast is not None:
            points, t_uv, t_host, t_depth, t_unc, t_obs = fast
            if not points:
                return None
            n = len(points)
            host_uv[:n] = t_uv
            host_idx[:n] = t_host
            depths[:n] = np.maximum(0.01, t_depth)
            obs[:n, :F_real] = t_obs
            weight[:n] = self.alpha**2 / (
                self.alpha**2 + np.sqrt(np.abs(t_unc)) ** 2
            )
        else:
            kpts = self.keypoints(frames)
            if not kpts:
                return None
            # Longest tracks first; fixed P slots.
            items = sorted(kpts.items(), key=lambda kv: -len(kv[1]))[:max_points]
            frame_index = {id(f): i for i, f in enumerate(frames)}

            points = []
            for p_i, (pt, local) in enumerate(items):
                host_frame, host_kp_idx = local[0]
                x, y = host_frame.kps[host_kp_idx]
                host_uv[p_i] = (x, y)
                host_idx[p_i] = frame_index[id(host_frame)]
                depths[p_i] = max(0.01, float(host_frame.depth[y, x]))
                for fr, _ in local:
                    obs[p_i, frame_index[id(fr)]] = True
                unc = float(host_frame.uncertainty[y, x])
                weight[p_i] = self.alpha**2 / (
                    self.alpha**2 + np.sqrt(abs(unc)) ** 2
                )
                points.append(pt)

        # A TUPLE of per-frame device images (cached uploads) — the solver
        # stacks them INSIDE its jit. Stacking eagerly here cost F+1 device
        # dispatches (expand_dims x F + a 25 MB concat) per keyframe, the
        # dominant measured share of BA assembly host time. Pad slots reuse
        # one cached zero image. Small fields stay numpy: the jit call
        # binds them in one batched transfer.
        images = tuple(self._device_image(f) for f in frames)
        # The solver's in-jit stack requires one dtype across the window:
        # a uint8/f32 mix would be silently promoted with the /255 branch
        # keyed on the STACKED dtype — a 255x photometric mismatch. Today
        # the cache never holds both (keyframe images are never evicted
        # mid-window); fail loudly if a future change breaks that.
        if any(im.dtype != images[0].dtype for im in images[1:]):
            raise AssertionError(
                "window images have mixed dtypes: "
                f"{[str(im.dtype) for im in images]} — the BA image stack "
                "must be homogeneous (uint8 OR f32, never both)"
            )
        zero = self._zero_image(H, W, dtype=images[0].dtype)
        images = images + (zero,) * (F - F_real)
        poses = np.stack(
            [f.pose for f in frames] + [np.eye(4)] * (F - F_real)
        ).astype(np.float32)

        problem = BAProblem(
            images=images,
            K=np.asarray(intrinsic, np.float32),
            poses=poses,
            depths=depths,
            host_uv=host_uv,
            host_idx=host_idx,
            obs_mask=obs,
            weight=weight,
        )
        return problem, points

    def _write_back(self, frames, points, poses, depths) -> None:
        poses = np.asarray(poses, np.float64)
        depths = np.asarray(depths)
        for i, f in enumerate(frames):
            f.pose = poses[i]
        for p_i, pt in enumerate(points):
            pt.update_host_depth(max(0.01, float(depths[p_i])))

    def flush_ba(self) -> None:
        """Materialize an in-flight pipelined BA into host frame/point state.

        Called before anything reads or rebuilds from host poses/depths
        (the next optimize, global BA, trajectory export).
        """
        if self._pending_ba is None:
            return
        window, points, poses, depths = self._pending_ba
        self._pending_ba = None
        self._write_back(
            window, points, np.asarray(poses)[: len(window)], depths
        )

    def optimize(
        self,
        intrinsic: np.ndarray,
        iters: int = 6,
        verbose: bool = False,
        pipelined: bool = True,
    ) -> bool:
        """Windowed BA over current keyframes + marginalization
        (reference ``:222-319``).

        ``pipelined=True`` (default) dispatches the jitted solver
        asynchronously and defers the host write-back until the next read
        (``flush_ba``) — the solver runs while the frontend processes the
        next frame, hiding one device round-trip per keyframe. Results are
        identical; they just land one frame later.
        """
        import time as _time

        self.flush_ba()
        window = self.keyframes[-self.num_kf:]
        _t0 = _time.perf_counter()
        built = self._build_problem(
            intrinsic, window, self.max_points, pad_frames=self.num_kf
        )
        # Host-side problem-assembly cost, separated from the device solve
        # (bench.py --slam folds it into the local-chip model).
        self.build_s += _time.perf_counter() - _t0
        if built is None:
            return False
        problem, points = built
        n_real = jnp.asarray(len(window), jnp.int32)
        if self.ba_levels == (1,):
            poses, depths, diag = photometric_ba(
                problem, num_iters=iters, depth_damping=self.depth_damping,
                prior_weight=self.pose_prior_weight, num_real=n_real,
                estimate_affine=self.estimate_affine,
                huber_delta=self.huber_delta,
            )
        else:
            poses, depths, diag = photometric_ba_pyramid(
                problem, levels=self.ba_levels,
                iters_per_level=(iters,) * len(self.ba_levels),
                depth_damping=self.depth_damping,
                prior_weight=self.pose_prior_weight, num_real=n_real,
                estimate_affine=self.estimate_affine,
                huber_delta=self.huber_delta,
            )
        if verbose:
            print(
                f"windowed BA chi2_photo: {float(diag['chi2_photo']):.6f} "
                f"(+prior {float(diag['chi2_prior']):.6f})"
            )
        if pipelined and not verbose:
            self._pending_ba = (window, points, poses, depths)
        else:
            self._write_back(window, points, poses[: len(window)], depths)

        # Marginalize the oldest keyframe once the window is full: its points
        # become invalid (reference ``:296-319``).
        if len(self.keyframes) >= self.num_kf:
            old = self.keyframes.pop(0)
            for pt in old.pts.values():
                pt.valid = False
        self._evict_device_images()
        return True

    # --------------------------------------------------------- global BA
    _F_BUCKETS = (8, 16, 32, 48, 64, 96, 128, 192, 256, 384, 512)
    _P_BUCKETS = (256, 512, 1024, 2048, 4096)

    @staticmethod
    def _bucket(n: int, buckets) -> int:
        for b in buckets:
            if n <= b:
                return b
        return n

    def _gather_global_tracks(self, kfs: List[Frame], max_points: int,
                              max_offsets: int):
        """Track gather over the FULL keyframe history for
        :meth:`global_bundle_adjustment` — includes points already
        marginalized by windowed BA (``Point.valid`` is ignored: validity
        only marks a point as done for the sliding WINDOW; its
        observations remain true history). Observations more than
        ``max_offsets`` keyframes after a point's host are dropped (the
        offset-banded solver's track-length cap).

        Returns ``(points, host_uv [n,2] f32, host_idx [n] i32,
        depth [n] f32, weight [n] f32, obs_off [n, max_offsets] bool)``
        or None when no multi-keyframe track exists.
        """
        F_hist = len(kfs)
        snaps = [getattr(f, "slot_pt_id", None) for f in kfs]
        if all(s is not None for s in snaps):
            # KLT path: pure array ops over the per-keyframe slot->Point-id
            # snapshots (same layout as _gather_tracks_fast, full history).
            M = np.stack(snaps)  # [F_hist, S]
            uids, inv = np.unique(M, return_inverse=True)
            inv = inv.reshape(M.shape)
            obs_full = np.zeros((len(uids), F_hist), bool)
            obs_full[inv, np.arange(F_hist)[:, None]] = True
            slot_arr = np.zeros(len(uids), np.int64)
            slot_arr[inv] = np.broadcast_to(np.arange(M.shape[1]), M.shape)
            n_obs = obs_full.sum(1)
            keep = (uids >= 0) & (n_obs >= 2)
            if not keep.any():
                return None
            order = np.flatnonzero(keep)[
                np.argsort(-n_obs[keep], kind="stable")
            ][:max_points]
            host_f = obs_full[order].argmax(1)
            slots = slot_arr[order]
            kps_all = np.stack([f.kps for f in kfs])
            uv = kps_all[host_f, slots].astype(np.float32)
            obs_sel = obs_full[order]
            points = [self.points[u] for u in uids[order]]
        else:
            # ORB path: Point walk over the history keyframe set.
            frame_index = {id(f): i for i, f in enumerate(kfs)}
            items = []
            for pt in self.points:
                local = [
                    (fr, idx)
                    for fr, idx in zip(pt.frames, pt.idxs)
                    if id(fr) in frame_index
                ]
                if len(local) > 1:
                    items.append((pt, local))
            if not items:
                return None
            items.sort(key=lambda kv: -len(kv[1]))
            items = items[:max_points]
            n = len(items)
            host_f = np.zeros(n, np.int64)
            uv = np.zeros((n, 2), np.float32)
            obs_sel = np.zeros((n, F_hist), bool)
            points = []
            for i, (pt, local) in enumerate(items):
                hf, hkp = local[0]
                host_f[i] = frame_index[id(hf)]
                uv[i] = hf.kps[hkp]
                for fr, _ in local:
                    obs_sel[i, frame_index[id(fr)]] = True
                points.append(pt)

        # Offset grid: observed at host + 1 + l, l in [0, max_offsets).
        cols = host_f[:, None] + 1 + np.arange(max_offsets)[None, :]
        in_range = cols < F_hist
        obs_off = (
            np.take_along_axis(
                obs_sel, np.clip(cols, 0, F_hist - 1), axis=1
            )
            & in_range
        )
        # A host whose every observation fell beyond the offset cap has no
        # edges; keep it (zero rows are masked in the solver) — dropping
        # would reshuffle the points list for no benefit.
        xs = uv[:, 0].astype(np.int64)
        ys = uv[:, 1].astype(np.int64)
        depth = np.empty(len(points), np.float32)
        unc = np.empty(len(points), np.float32)
        for fi in np.unique(host_f):
            sel = host_f == fi
            depth[sel] = kfs[fi].depth[ys[sel], xs[sel]]
            unc[sel] = kfs[fi].uncertainty[ys[sel], xs[sel]]
        weight = self.alpha**2 / (self.alpha**2 + np.sqrt(np.abs(unc)) ** 2)
        return (
            points, uv, host_f.astype(np.int32),
            np.maximum(0.01, depth), weight.astype(np.float32),
            obs_off,
        )

    def global_bundle_adjustment(
        self, intrinsic: np.ndarray, iters: int = 21, verbose: bool = True,
        max_offsets: int = 8, max_points: int = 2048,
    ) -> bool:
        """Photometric BA over the FULL keyframe history
        (reference ``slam/optimizer.py:99-220``: one graph over all
        keyframes, 20 iterations staged x3 — here the iterations run as one
        coarse-to-fine pyramid pass; LM re-linearizes every iteration, so
        extra stages add nothing the scan's later iterations don't).

        Unlike the windowed solve this covers keyframes already
        MARGINALIZED out of the sliding window — the drift-correction
        regime global BA exists for. Shapes are bucketed (``_F_BUCKETS`` /
        ``_P_BUCKETS``) so a growing trajectory compiles O(log F) programs,
        and the track-banded solver (``slam/global_ba.py``) keeps the edge
        set at P x ``max_offsets`` regardless of trajectory length. Images
        ship as ONE stacked upload (uint8 when every keyframe ingested
        uint8 with identity brightness affine).
        """
        from deep_visual_slam_tpu.slam.global_ba import (
            GlobalBAProblem,
            photometric_ba_global_pyramid,
        )

        self.flush_ba()
        kfs = [f for f in self.frames if f.anchor is f]
        F_real = len(kfs)
        if F_real < 2:
            return False
        gathered = self._gather_global_tracks(kfs, max_points, max_offsets)
        if gathered is None:
            return False
        points, uv, host_idx, depth0, weight, obs_off = gathered
        n = len(points)
        F = self._bucket(F_real, self._F_BUCKETS)
        P = self._bucket(max(n, 1), self._P_BUCKETS)
        H, W = kfs[0].image.shape[:2]

        uint8_ok = all(
            f.image.dtype == np.uint8 and f.a == 1.0 and f.b == 0.0
            for f in kfs
        )
        # CHANNEL-FIRST stack: a C=3-minor f32 array on TPU is tiled with
        # the lane dim padded 3 -> 128 (42.7x HBM = 20 GB at F=128
        # full-res); transposing on the host keeps (H, W) minor so the
        # device copy is compact (see slam/global_ba.py docstring).
        if uint8_ok:
            stack = np.zeros((F, 3, H, W), np.uint8)
            for i, f in enumerate(kfs):
                stack[i] = f.image.transpose(2, 0, 1)
        else:
            stack = np.zeros((F, 3, H, W), np.float32)
            for i, f in enumerate(kfs):
                img = np.asarray(f.image, np.float32)
                if f.image.dtype == np.uint8:
                    img = img / 255.0
                if img.ndim == 2:
                    img = np.repeat(img[..., None], 3, axis=-1)
                stack[i] = (f.a * img + f.b).transpose(2, 0, 1)

        host_uv = np.zeros((P, 2), np.float32)
        host_i = np.zeros(P, np.int32)
        depths = np.full(P, 1.0, np.float32)
        w_arr = np.zeros(P, np.float32)
        obs = np.zeros((P, max_offsets), bool)
        host_uv[:n] = uv
        host_i[:n] = host_idx
        depths[:n] = depth0
        w_arr[:n] = weight
        obs[:n] = obs_off

        poses = np.stack(
            [f.pose for f in kfs] + [np.eye(4)] * (F - F_real)
        ).astype(np.float32)
        problem = GlobalBAProblem(
            images=jnp.asarray(stack),
            K=np.asarray(intrinsic, np.float32),
            poses=poses,
            depths=depths,
            host_uv=host_uv,
            host_idx=host_i,
            obs_off=obs,
            weight=w_arr,
        )
        n_real = jnp.asarray(F_real, jnp.int32)
        levels = self.ba_levels
        ipl = tuple(max(iters // len(levels), 1) for _ in levels)
        new_poses, new_depths, diag = photometric_ba_global_pyramid(
            problem, levels=levels, iters_per_level=ipl,
            depth_damping=self.depth_damping,
            prior_weight=self.pose_prior_weight, num_real=n_real,
            huber_delta=self.huber_delta,
        )
        if verbose:
            print(
                f"global BA ({F_real} keyframes, {n} tracks): "
                f"chi2_photo {float(diag['chi2_photo']):.6f} "
                f"(+prior {float(diag['chi2_prior']):.6f})"
            )
        self._write_back(
            kfs, points, np.asarray(new_poses)[:F_real], new_depths
        )
        return True
