"""KLT SLAM frontend: device-tracked point table replacing per-frame ORB.

The reference frontend (``/root/reference/slam/frontend.py:22-67``) extracts
ORB + KNN-matches EVERY frame on the host CPU — ~170 ms/frame on a 1-core
host, the wall that keeps the full SLAM loop far from the 60 FPS target.
This frontend replaces descriptors with device-side tracking:

  - a fixed table of P point slots, tracked frame-to-frame by pyramidal
    Lucas-Kanade **inside the same XLA dispatch as the depth/pose networks**
    (one device round-trip per frame, zero per-frame host vision work),
  - Shi-Tomasi detection on device, run only when a keyframe is created,
    to replenish dead slots (occupancy-suppressed so new corners keep their
    distance from live tracks),
  - the reference keyframe score ``0.6*f + 0.4*ft > 1`` (RMS displacement +
    rotation-compensated displacement, ``slam/optimizer.py:59-97``) computed
    from the tracked displacements — it needs displacements, not
    descriptors,
  - ``Frame``/``Point`` bookkeeping identical to the ORB path, so
    ``Map._build_problem`` / windowed photometric BA run unchanged: a slot's
    track becomes a multi-keyframe ``Point`` whose host is the keyframe
    where it was (re)born.

The ORB/Lowe path remains available as ``MonoVO(frontend="orb")`` for
reference parity; this is the TPU-native default.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_visual_slam_tpu.ops import disp_to_depth, transformation_from_parameters
from deep_visual_slam_tpu.ops.klt import (
    build_pyramid,
    rgb_to_gray,
    shi_tomasi_corners,
    track_points,
)
from deep_visual_slam_tpu.slam.frontend import Frame, Point


class KLTFrontend:
    """Fixed-size device track table + jitted fused net/track step."""

    def __init__(
        self,
        networks,
        image_shape: Tuple[int, int],
        max_tracks: int = 256,
        levels: int = 4,
        win: int = 4,
        iters: int = 8,
        max_err: float = 0.08,
        nms_radius: int = 7,
        min_tracks: int = 24,
        intrinsic: "np.ndarray | None" = None,
    ):
        self.nn = networks
        self.P = max_tracks
        # 3x3 intrinsics for the keyframe score's rotation-flow homography
        # (K R K^-1). None falls back to the reference's raw R-on-pixels
        # form, which is a BUG upstream (optimizer.py:76,86 applies the
        # bare rotation to unnormalized pixel coordinates, so the
        # perspective division inflates ft with the pixel magnitude —
        # measured scores of 20-100 at 0.4 px of true flow, forcing EVERY
        # frame to be a keyframe; documented in README).
        self.K3 = None if intrinsic is None else np.asarray(
            intrinsic, np.float64
        )[:3, :3]
        self.levels = levels
        self.min_tracks = min_tracks
        self.nms_radius = nms_radius
        H, W = image_shape
        self.image_shape = image_shape

        from deep_visual_slam_tpu.models.fused_vo import make_fused_vo_apply

        fused = make_fused_vo_apply(
            networks.depth_model, networks.pose_model, depth_on="second"
        )
        nn = networks

        def _f01(img):
            """uint8 ingest -> [0,1] f32 (trace-time dtype gate; the LK
            max_err threshold and the nets both live in [0,1] units)."""
            if img.dtype == jnp.uint8:
                return img.astype(jnp.float32) / 255.0
            return img

        @jax.jit
        def _step(prev_img, prev_pyr, cur_img, uv, alive):
            """ONE dispatch: depth(cur) + pose(prev->cur) + LK track (+ the
            D3VO uncertainty map when the head is enabled)."""
            prev_img, cur_img = _f01(prev_img), _f01(cur_img)
            disps, (aa, t) = fused(nn._dv, nn._pv, prev_img, cur_img)
            _, depth = disp_to_depth(
                disps[("disp", 0)], nn.min_depth, nn.max_depth
            )
            T = transformation_from_parameters(aa[:, 0, 0], t[:, 0, 0])
            pyr = tuple(build_pyramid(rgb_to_gray(cur_img[0]), levels))
            uv2, ok, err = track_points(
                prev_pyr, pyr, uv, alive, win=win, iters=iters, max_err=max_err
            )
            return depth[..., 0], nn._sigma_to_unc(disps), T, pyr, uv2, ok

        @jax.jit
        def _pyramid(img):
            return tuple(build_pyramid(rgb_to_gray(_f01(img)[0]), levels))

        @jax.jit
        def _detect(gray0, uv, alive):
            return shi_tomasi_corners(
                gray0, max_tracks, nms_radius=nms_radius,
                occupied_uv=uv, occupied_mask=alive,
            )

        self._step_fn = _step
        self._pyramid_fn = _pyramid
        self._detect_fn = _detect

        # Accumulated wall time spent in device corner detection (its own
        # timing bucket: it runs only at keyframes, off the per-frame path).
        self.detect_s = 0.0
        # Host-side track table.
        self.uv = np.zeros((self.P, 2), np.float32)
        self.alive = np.zeros(self.P, bool)
        self.points: List[Optional[Point]] = [None] * self.P
        self.kf_uv = np.zeros((self.P, 2), np.float32)
        self.kf_alive = np.zeros(self.P, bool)
        # Device mirrors (uploaded on keyframes, chained between frames).
        self._uv_dev = jnp.asarray(self.uv)
        self._alive_dev = jnp.asarray(self.alive)
        self._pyr = None

    # ------------------------------------------------------------- tracking
    def step(self, prev_img_dev, cur_img_dev):
        """Fused net+track dispatch; returns (depth [1,H,W] DEVICE array,
        unc [1,H,W] DEVICE array or None, T_rel [4,4] np) and updates the
        device track state (host copies too).

        Only the small state crosses to the host here — the track table
        (~2.5 KB) and the 4x4 pose; the dense depth map stays on device so
        callers that don't need it per frame (keyframe-only BA, no depth
        video) skip a megabyte-scale D2H transfer per frame."""
        depth, unc, T, pyr, uv2, ok = self._step_fn(
            prev_img_dev, self._pyr, cur_img_dev, self._uv_dev, self._alive_dev
        )
        self._pyr = pyr
        self._uv_dev = uv2
        self._alive_dev = ok
        # np.array (copy): asarray of a device buffer is read-only, and the
        # table is mutated in-place by keyframe replenishment.
        self.uv = np.array(uv2)
        self.alive = np.array(ok)
        return depth, unc, np.asarray(T[0], np.float64)

    def init_first(self, img_dev) -> None:
        """First frame: build the pyramid and fill the table by detection."""
        self._pyr = self._pyramid_fn(img_dev)
        self._refresh_device_state()

    def _refresh_device_state(self) -> None:
        self._uv_dev = jnp.asarray(self.uv)
        self._alive_dev = jnp.asarray(self.alive)

    # ------------------------------------------------------------ keyframes
    def keyframe_score(self, pose_global: np.ndarray, last_kf_pose: np.ndarray):
        """Reference score ``0.6*f + 0.4*ft`` over tracks live since the last
        keyframe; None means tracking is starved (caller forces a keyframe)."""
        sel = self.kf_alive & self.alive
        n = int(sel.sum())
        if n < self.min_tracks:
            return None
        p1 = self.kf_uv[sel]
        p2 = self.uv[sel]
        d = p1 - p2
        f = float(np.sqrt(np.mean(np.sum(d * d, axis=1))))

        R1 = last_kf_pose[:3, :3]
        R2 = pose_global[:3, :3]
        Ht = R1 @ np.linalg.inv(R2)
        if self.K3 is not None:
            # Pixel-space rotation homography: K R K^-1 (the reference
            # applies the bare R to pixel coords — see __init__ note).
            Ht = self.K3 @ Ht @ np.linalg.inv(self.K3)
        ones = np.ones((n, 1))
        p = (Ht @ np.concatenate([p2, ones], axis=1).T).T
        proj = p[:, :2] / np.maximum(np.abs(p[:, 2:3]), 1e-9) * np.sign(p[:, 2:3])
        dt = p1 - proj
        ft = float(np.sqrt(np.mean(np.sum(dt * dt, axis=1))))
        return 0.6 * f + 0.4 * ft

    def kps_int(self) -> np.ndarray:
        """All P slot positions as in-bounds int (x, y) for ``Frame.kps``."""
        H, W = self.image_shape
        x = np.clip(np.round(self.uv[:, 0]), 0, W - 1).astype(np.int32)
        y = np.clip(np.round(self.uv[:, 1]), 0, H - 1).astype(np.int32)
        return np.stack([x, y], axis=1)

    def register_keyframe(self, mp, frame: Frame) -> None:
        """Record observations of live tracks in this keyframe, re-host
        tracks whose Point died (marginalized), and replenish dead slots
        from device detection."""
        # 1) observations / re-hosting for live tracks.
        for slot in range(self.P):
            if not self.alive[slot]:
                continue
            pt = self.points[slot]
            if pt is not None and pt.valid and frame not in pt.frames:
                pt.add_observation(frame, slot)
            elif pt is None or not pt.valid:
                pt = Point(mp)
                pt.add_observation(frame, slot)
                self.points[slot] = pt

        # 2) replenish dead slots with fresh corners (device detection,
        #    occupancy-suppressed by live tracks).
        dead = np.flatnonzero(~self.alive)
        if len(dead):
            import time as _time

            t0 = _time.perf_counter()
            pts, score = self._detect_fn(
                self._pyr[0], self._uv_dev, self._alive_dev
            )
            pts, score = np.asarray(pts), np.asarray(score)
            self.detect_s += _time.perf_counter() - t0
            fresh = np.flatnonzero(score > 0)
            for slot, det_i in zip(dead, fresh):
                self.uv[slot] = pts[det_i]
                self.alive[slot] = True
                pt = Point(mp)
                pt.add_observation(frame, int(slot))
                self.points[slot] = pt
            self._refresh_device_state()

        # The Frame's kps were snapshotted before replenishment; refresh so
        # freshly detected corners host their Points at the right pixel.
        frame.kps = self.kps_int()
        self.kf_uv = self.uv.copy()
        self.kf_alive = self.alive.copy()
        # Slot -> Point-id snapshot for this keyframe: lets the Map gather
        # BA tracks with pure array ops (``Map._gather_tracks_fast``)
        # instead of per-Point python bookkeeping (~4 ms/keyframe at
        # P=256 on a 1-core host).
        frame.slot_pt_id = np.array(
            [
                self.points[s].id
                if self.alive[s] and self.points[s] is not None
                else -1
                for s in range(self.P)
            ],
            np.int64,
        )

    def drop_dead_points(self) -> None:
        """Free slots whose Point was invalidated by marginalization — they
        are re-hosted or replenished at the next keyframe."""
        for slot in range(self.P):
            pt = self.points[slot]
            if pt is not None and not pt.valid:
                self.points[slot] = None
