"""MonoVO: the per-frame SLAM pipeline (networks + frontend + backend).

Parity target: reference ``slam/MonoVO.py`` — per frame: DepthNet inference,
PoseNet inference vs the previous frame, frontend keypoint tracking, and
windowed backend optimization when a keyframe is added.

``Networks`` replaces the reference's stale TF wrapper (``slam/network.py``,
which imports modules absent from the tree, SURVEY.md §2.7) with jitted Flax
inference on the framework's own DepthNet/PoseNet.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deep_visual_slam_tpu.models import DepthNet, PoseNet
from deep_visual_slam_tpu.ops import disp_to_depth, transformation_from_parameters
from deep_visual_slam_tpu.slam.frontend import Frame, Point, match_frame_kps
from deep_visual_slam_tpu.slam.map import Map


class Networks:
    """Jitted DepthNet + PoseNet inference for the SLAM loop."""

    def __init__(
        self,
        depth_variables=None,
        pose_variables=None,
        image_shape: Tuple[int, int] = (480, 640),
        min_depth: float = 0.1,
        max_depth: float = 10.0,
        dtype=jnp.bfloat16,
        seed: int = 0,
        predict_uncertainty: bool = False,
        unc_sigma_floor: float = 0.1,
        unc_weight_scale: float = 100.0,
    ):
        """``predict_uncertainty`` enables the DepthNet D3VO uncertainty
        head (``from_checkpoint`` auto-detects it from the parameter tree).
        The head's sigma map becomes the per-keyframe uncertainty feeding
        the BA Eq.13 weights alpha^2/(alpha^2+unc) via

            unc = unc_weight_scale * max(sigma^2 - unc_sigma_floor^2, 0)

        so pixels at or below the calibrated noise floor get unc = 0 —
        weight EXACTLY 1, bit-identical to the zero-uncertainty path on
        clean scenes (no-harm by construction) — while violated pixels
        (sigma ~ 0.3 under the flicker fixture) land near weight ~ 0.03."""
        H, W = image_shape
        self.image_shape = image_shape
        self.predict_uncertainty = predict_uncertainty
        self._unc_floor = float(unc_sigma_floor)
        self._unc_scale = float(unc_weight_scale)
        self.depth_model = DepthNet(
            dtype=dtype, predict_uncertainty=predict_uncertainty
        )
        self.pose_model = PoseNet(dtype=dtype)
        key = jax.random.PRNGKey(seed)
        if depth_variables is None:
            depth_variables = jax.jit(self.depth_model.init)(
                key, jnp.zeros((1, H, W, 3), jnp.float32)
            )
        if pose_variables is None:
            pose_variables = jax.jit(self.pose_model.init)(
                key, jnp.zeros((1, H, W, 6), jnp.float32)
            )
        self._dv = depth_variables
        self._pv = pose_variables
        self.min_depth = min_depth
        self.max_depth = max_depth

        def _f01(img):
            """uint8 -> [0,1] f32 at trace time (the low-H2D ingest path);
            float images pass through."""
            if img.dtype == jnp.uint8:
                return img.astype(jnp.float32) / 255.0
            return img

        unc_floor2 = self._unc_floor ** 2
        unc_scale = self._unc_scale

        def _sigma_to_unc(disps):
            """Head sigma map -> BA uncertainty (None when the head is
            off): unc = scale * max(sigma^2 - floor^2, 0)."""
            if not predict_uncertainty:
                return None
            sigma = disps[("unc", 0)][..., 0]
            return unc_scale * jnp.maximum(sigma * sigma - unc_floor2, 0.0)

        @jax.jit
        def _depth(img):
            disps = self.depth_model.apply(self._dv, _f01(img), train=False)
            _, depth = disp_to_depth(
                disps[("disp", 0)], self.min_depth, self.max_depth
            )
            return depth[..., 0], _sigma_to_unc(disps)

        @jax.jit
        def _pose(img1, img2):
            pair = jnp.concatenate([_f01(img1), _f01(img2)], axis=-1)
            aa, t = self.pose_model.apply(self._pv, pair, train=False)
            return transformation_from_parameters(aa[:, 0, 0], t[:, 0, 0])

        from deep_visual_slam_tpu.models.fused_vo import make_fused_vo_apply

        # Merged-stem fused inference (models/fused_vo.py): depth on cur,
        # pose on the (prev, cur) pair, both stems as one conv.
        _fused = make_fused_vo_apply(
            self.depth_model, self.pose_model, depth_on="second"
        )

        @jax.jit
        def _step(prev_img, cur_img):
            # Fused depth+pose: ONE device dispatch per SLAM frame instead of
            # two — halves the per-frame RPC overhead of a remote/tunnelled
            # chip and lets XLA overlap the two networks.
            disps, (aa, t) = _fused(self._dv, self._pv, prev_img, cur_img)
            _, depth = disp_to_depth(
                disps[("disp", 0)], self.min_depth, self.max_depth
            )
            T = transformation_from_parameters(aa[:, 0, 0], t[:, 0, 0])
            return depth[..., 0], _sigma_to_unc(disps), T

        self._depth_fn = _depth
        self._pose_fn = _pose
        self._step_fn = _step
        # Exposed for fused consumers (KLTFrontend builds its own fused
        # dispatch and maps the head sigma the same way).
        self._sigma_to_unc = _sigma_to_unc

    @classmethod
    def from_checkpoint(cls, ckpt_dir: str, **kwargs) -> "Networks":
        """Build jitted SLAM inference from a ``train_vo.py`` orbax
        checkpoint dir (the trainer's {params:{depth,pose}, batch_stats}
        layout; reference loads epoch .pth files, ``vo/train.py:83-98``)."""
        from deep_visual_slam_tpu.utils.checkpoint import load_latest_tree

        loaded = load_latest_tree(ckpt_dir)
        if loaded is None:
            raise FileNotFoundError(f"no checkpoint under {ckpt_dir}")
        tree, step = loaded
        print(f"Networks.from_checkpoint: {ckpt_dir} @ step {step}")
        # Auto-detect the D3VO uncertainty head from the parameter tree
        # (class docstring): a checkpoint trained with the head restores
        # with it enabled; callers can still override explicitly.
        if "predict_uncertainty" not in kwargs:
            dec = tree["params"]["depth"].get("decoder", {})
            kwargs["predict_uncertainty"] = "uncconv_0" in dec
        return cls(
            depth_variables={"params": tree["params"]["depth"],
                             "batch_stats": tree["batch_stats"]["depth"]},
            pose_variables={"params": tree["params"]["pose"],
                            "batch_stats": tree["batch_stats"]["pose"]},
            **kwargs,
        )

    def depth(self, image: np.ndarray) -> np.ndarray:
        """[H, W, 3] float-or-uint8 image -> [H, W] metric depth."""
        d, _ = self._depth_fn(self.to_device(image))
        return np.asarray(d[0])

    def depth_unc(self, image: np.ndarray):
        """([H, W] metric depth, [H, W] BA uncertainty or None) — the
        uncertainty is the head's sigma mapped through the Eq.13 transfer
        (class docstring); None when ``predict_uncertainty`` is off."""
        d, u = self._depth_fn(self.to_device(image))
        return np.asarray(d[0]), (None if u is None else np.asarray(u[0]))

    def pose(self, image1: np.ndarray, image2: np.ndarray) -> np.ndarray:
        """Relative transform prev->cur as a 4x4 (prev frame 1, cur frame 2)."""
        T = self._pose_fn(self.to_device(image1), self.to_device(image2))
        return np.asarray(T[0], np.float64)

    def step(self, prev_image: np.ndarray, image: np.ndarray):
        """Fused per-frame inference: ([H,W] depth of ``image``, 4x4 relative
        transform prev->cur) in a single device dispatch. Accepts host or
        (already-uploaded) device arrays."""
        depth, _, T = self._step_fn(
            self.to_device(prev_image), self.to_device(image)
        )
        return np.asarray(depth[0]), np.asarray(T[0], np.float64)

    def step_async(self, prev_image, image):
        """Dispatch the fused step WITHOUT synchronizing — returns device
        arrays ``(depth, unc-or-None, T)``. The caller overlaps host work
        (ORB, matching) with the accelerator and materializes the results
        afterwards."""
        return self._step_fn(self.to_device(prev_image), self.to_device(image))

    @staticmethod
    def to_device(image) -> jnp.ndarray:
        """[H, W, 3] image -> [1, H, W, 3] device array (idempotent).

        uint8 input stays uint8 ON THE WIRE — 0.92 MB/frame H2D at 640x480
        instead of 3.7 MB; every jitted consumer (fused step, KLT pyramid,
        BA image stack) scales to [0,1] on device. Float input uploads as
        fp32 (the legacy path)."""
        if isinstance(image, jnp.ndarray):
            if image.ndim == 4:
                return image
            # Already on device: stay there (np.asarray would round-trip
            # the frame through the host — a latency trap over a ~100 ms
            # RPC tunnel).
            if image.dtype == jnp.uint8:
                return image[None]
            return image.astype(jnp.float32)[None]
        image = np.asarray(image)
        if image.dtype == np.uint8:
            return jnp.asarray(image)[None]
        return jnp.asarray(image, jnp.float32)[None]


class MonoVO:
    """Full monocular SLAM loop (reference ``slam/MonoVO.py:15-72``).

    ``frontend``:
      - ``"klt"`` (default, TPU-native): device-side Shi-Tomasi + pyramidal
        Lucas-Kanade tracking fused into the SAME XLA dispatch as the
        depth/pose networks (``slam/klt_frontend.py``) — zero per-frame host
        vision work. This removes the reference's CPU wall (serial ORB+KNN,
        ~170 ms/frame on a 1-core host, ``/root/reference/slam/frontend.py``).
      - ``"orb"``: the reference-parity host path (ORB + Lowe KNN), overlapped
        with an async network dispatch.
    """

    def __init__(
        self,
        intrinsic: np.ndarray,
        networks: Optional[Networks] = None,
        image_shape: Tuple[int, int] = (480, 640),
        num_kf: int = 7,
        max_points: int = 256,
        frontend: str = "klt",
        fetch_depth: bool = True,
        ba_levels=(2, 1),
        depth_damping: float = 1.0,
        pose_prior_weight: float = 1e3,
        estimate_affine: bool = False,
        huber_delta: float = 0.11,
    ):
        self.intrinsic = np.asarray(intrinsic)
        self.mp = Map(num_kf=num_kf, max_points=max_points,
                      ba_levels=ba_levels, depth_damping=depth_damping,
                      pose_prior_weight=pose_prior_weight,
                      estimate_affine=estimate_affine,
                      huber_delta=huber_delta)
        # Correct rotation-flow homography for the keyframe score (K R
        # K^-1; the reference applies bare R to pixels — see Map/
        # KLTFrontend notes).
        self.mp.intrinsic3 = self.intrinsic[:3, :3]
        self.nn = networks or Networks(image_shape=image_shape)
        # Cumulative per-stage wall time (seconds) for `bench.py --slam`.
        self.timings = {
            "networks": 0.0, "frontend": 0.0, "detect": 0.0, "backend_ba": 0.0,
        }
        self.n_keyframes = 0
        self._prev_dev = None  # previous frame, already on device
        self._zero_unc = None  # shared read-only zero uncertainty map
        if frontend not in ("klt", "orb"):
            raise ValueError(f"unknown frontend {frontend!r} (klt|orb)")
        self.frontend_kind = frontend
        # fetch_depth=False (KLT path only) skips the per-frame dense-depth
        # D2H transfer; depth is still fetched for keyframes (the BA problem
        # reads host depth at point-host pixels) and ``process_frame``
        # returns None for the other frames. The reference always returns
        # depth (it renders it every frame); keep True for parity.
        self.fetch_depth = fetch_depth
        if frontend == "klt":
            from deep_visual_slam_tpu.slam.klt_frontend import KLTFrontend

            self.klt: Optional[KLTFrontend] = KLTFrontend(
                self.nn, image_shape, max_tracks=max_points,
                intrinsic=self.intrinsic,
            )
        else:
            self.klt = None

    def _zero_uncertainty(self, shape) -> np.ndarray:
        """Shared read-only zero uncertainty map (the nets do not emit D3VO
        uncertainty; allocating 1.2 MB of zeros per keyframe is pure waste).
        Read-only so no caller can mutate the shared buffer in place."""
        z = self._zero_unc
        if z is None or z.shape != tuple(shape):
            z = np.zeros(shape, np.float32)
            z.flags.writeable = False
            self._zero_unc = z
        return z

    def process_frame(
        self,
        frame: np.ndarray,
        optimize: bool = True,
        oracle_depth: Optional[np.ndarray] = None,
        oracle_rel: Optional[np.ndarray] = None,
        oracle_uncertainty: Optional[np.ndarray] = None,
    ):
        """Run one RGB frame ([H, W, 3] float [0,1]) through the pipeline.

        Dispatches on the configured frontend; both paths share the Map
        backend (windowed photometric BA) and return
        ``(depth, uncertainty, pose_global, a, b)``.

        ``oracle_depth`` / ``oracle_rel`` (KLT path only) override the
        network depth map / relative prev->cur pose for THIS frame — the
        backend-isolation hook used by ``scripts/ba_ablation.py`` to
        evaluate the BA backend from a controlled (e.g. GT-plus-noise)
        initialization, independent of network training state.
        ``oracle_uncertainty`` ([H, W] float) injects a D3VO uncertainty
        map for THIS frame (keyframes read it into the BA weights
        ``alpha^2/(alpha^2+unc)``, ``slam/map.py``): the
        distractor-ablation hook that validates the Eq.13 weighting path
        independent of a trained uncertainty head.
        """
        if self.klt is not None:
            return self._process_frame_klt(
                frame, optimize, oracle_depth, oracle_rel, oracle_uncertainty
            )
        if (oracle_depth is not None or oracle_rel is not None
                or oracle_uncertainty is not None):
            raise ValueError("oracle injection requires the KLT frontend")
        return self._process_frame_orb(frame, optimize)

    # ------------------------------------------------------------ KLT path
    def _process_frame_klt(
        self,
        frame: np.ndarray,
        optimize: bool,
        oracle_depth: Optional[np.ndarray] = None,
        oracle_rel: Optional[np.ndarray] = None,
        oracle_uncertainty: Optional[np.ndarray] = None,
    ):
        """TPU-native per-frame step: ONE fused device dispatch computes
        depth + relative pose + LK track updates; the host only does pose
        composition and Frame/Point bookkeeping (microseconds). Keyframe
        decisions use the reference score computed from tracked
        displacements — no descriptors, no matching."""
        import time as _time

        t0 = _time.perf_counter()
        cur_dev = self.nn.to_device(frame)
        first = len(self.mp.frames) == 0
        depth_dev = None
        unc_dev = None
        if first:
            if oracle_depth is not None:
                depth = np.asarray(oracle_depth, np.float32)
            else:
                depth, net_unc = self.nn.depth_unc(frame)
                unc_dev = net_unc  # host array; handled uniformly below
            pose_global = np.eye(4)
            self.klt.init_first(cur_dev)
        else:
            depth_dev, unc_dev, rel = self.klt.step(self._prev_dev, cur_dev)
            if oracle_depth is not None:
                depth = np.asarray(oracle_depth, np.float32)
            else:
                depth = np.asarray(depth_dev[0]) if self.fetch_depth else None
            if oracle_rel is not None:
                rel = np.asarray(oracle_rel, np.float64)
            # Materialize any in-flight pipelined BA BEFORE chaining: the
            # solve was dispatched last keyframe and has had a full network
            # step to run, so this is a cheap join — but skipping it chains
            # the new frame off the PRE-correction keyframe pose, and that
            # stale rel becomes an artificial photometric inconsistency the
            # next window then fights (measured at 640x480: init chi2 grows
            # 0.5 -> 39 over 15 keyframes and BA flips from helping to
            # hurting ATE).
            self.mp.flush_ba()
            # Chain off the previous frame's REFRESHED pose so BA
            # corrections feed forward into the odometry.
            pose_global = rel @ self.mp.frames[-1].current_pose()
        self._prev_dev = cur_dev
        a, b = 1.0, 0.0
        # Keyframe decision BEFORE Frame construction (the score needs only
        # tracked displacements + poses), so non-keyframes skip the host
        # depth copy and uncertainty allocation entirely.
        if first:
            is_kf = True
        else:
            score = self.klt.keyframe_score(
                pose_global, self.mp.keyframes[-1].pose
            )
            is_kf = score is None or score > 1.0
        t1 = _time.perf_counter()
        self.timings["networks"] += t1 - t0

        kf_depth = None
        if is_kf:
            # Writable copy: the BA write-back mutates keyframe depth. Only
            # keyframes carry host depth/uncertainty (the BA problem reads
            # them); non-keyframes return the fetched (read-only) map as is.
            src = depth if depth is not None else depth_dev[0]
            kf_depth = np.array(src)
            if depth is not None:
                depth = kf_depth
        if is_kf:
            # Keyframe uncertainty precedence: oracle injection (ablation
            # hook) > the trained D3VO head (``Networks
            # predict_uncertainty``) > the shared zero map (reference
            # runnable-path parity, slam/MonoVO.py:19-27).
            if oracle_uncertainty is not None:
                unc = np.asarray(oracle_uncertainty, np.float32)
            elif unc_dev is not None:
                u = np.asarray(unc_dev, np.float32)
                unc = u[0] if u.ndim == 3 else u
            else:
                unc = self._zero_uncertainty(frame.shape[:2])
        else:
            unc = None
        f = Frame(
            self.mp, np.asarray(frame), kf_depth, unc,
            pose_global, (a, b), features=(self.klt.kps_int(), None),
        )
        detect_delta = 0.0
        if is_kf:
            if depth is None:
                depth = kf_depth  # fetch_depth=False: keyframes still report
            det0 = self.klt.detect_s
            self.mp.register_keyframe(f)
            self.klt.register_keyframe(self.mp, f)
            detect_delta = self.klt.detect_s - det0
            self.timings["detect"] += detect_delta
        else:
            f.set_anchor(self.mp.keyframes[-1])
        self.mp.register_device_image(f.id, cur_dev[0])
        t2 = _time.perf_counter()
        # The frontend bucket is pure host bookkeeping; device detection
        # (keyframes only) is accounted separately.
        self.timings["frontend"] += (t2 - t1) - detect_delta
        if not is_kf:
            return depth, f.uncertainty, f.pose, a, b

        self.n_keyframes += 1
        if optimize and not first:
            self.mp.optimize(self.intrinsic)
            self.klt.drop_dead_points()
            self.timings["backend_ba"] += _time.perf_counter() - t2
        return depth, f.uncertainty, f.pose, a, b

    # ------------------------------------------------------------ ORB path
    def _process_frame_orb(self, frame: np.ndarray, optimize: bool = True):
        """Run one RGB frame ([H, W, 3] float [0,1]) through the pipeline.

        The host frontend (ORB + KNN matching, the classical CPU cost of a
        SLAM loop) runs WHILE the accelerator computes depth+pose: the fused
        network step is dispatched asynchronously, features are extracted and
        matched against the previous frame, and only then are the device
        results materialized.

        Note: with pipelined BA (Map.optimize default) the returned pose is
        the network-composed pose; the BA refinement lands at the next read
        (``trajectory()`` / the next optimize), one frame later.
        """
        import time as _time

        from deep_visual_slam_tpu.slam.frontend import (
            extract_features,
            match_descriptors,
        )

        t0 = _time.perf_counter()
        # Upload once; reused as next frame's "prev" and by the BA backend.
        cur_dev = self.nn.to_device(frame)
        first = len(self.mp.frames) == 0
        if not first:
            pending = self.nn.step_async(self._prev_dev, cur_dev)  # async
        self._prev_dev = cur_dev

        # Host work overlapped with the device step.
        feats = extract_features(np.asarray(frame))
        if first:
            match = None
        else:
            prev_f = self.mp.frames[-1]
            match = match_descriptors(prev_f.des, feats[1])

        net_unc = None
        if first:
            depth, net_unc = self.nn.depth_unc(frame)
            pose_global = np.eye(4)
        else:
            depth = np.asarray(pending[0][0])  # sync point
            if pending[1] is not None:
                net_unc = np.asarray(pending[1][0], np.float32)
            rel = np.asarray(pending[2][0], np.float64)
            # Land any pipelined BA before chaining (see the KLT path for
            # the measured stale-rel failure this avoids).
            self.mp.flush_ba()
            # Frame pose is GLOBAL T_cw: compose the relative net pose onto
            # the previous frame's global (BA-refreshed) pose.
            pose_global = rel @ self.mp.frames[-1].current_pose()
        uncertainty = (
            net_unc if net_unc is not None else np.zeros_like(depth)
        )
        a, b = 1.0, 0.0
        t1 = _time.perf_counter()
        self.timings["networks"] += t1 - t0

        is_kf = self.frontend(
            frame, depth, uncertainty, pose_global, (a, b),
            features=feats, match_from_prev=match,
        )
        # Seed the map's device-image cache with the already-uploaded frame
        # (valid: a=1, b=0) so windowed BA never re-transfers it.
        self.mp.register_device_image(self.mp.frames[-1].id, cur_dev[0])
        t2 = _time.perf_counter()
        self.timings["frontend"] += t2 - t1
        if not is_kf:
            return depth, uncertainty, self.mp.frames[-1].pose, a, b

        self.n_keyframes += 1
        if optimize:
            self.mp.optimize(self.intrinsic)
            self.timings["backend_ba"] += _time.perf_counter() - t2
        return depth, uncertainty, self.mp.frames[-1].pose, a, b

    def frontend(
        self,
        frame,
        depth,
        uncertainty,
        pose,
        brightness_params,
        features=None,
        match_from_prev=None,
    ) -> bool:
        """Track keypoints vs the previous frame; returns True when a new
        keyframe was added (=> run backend). ``features`` / ``match_from_prev``
        carry work already done while the accelerator was busy."""
        f = Frame(
            self.mp, frame, depth, uncertainty, pose, brightness_params,
            features=features,
        )

        if f.id == 0:
            self.mp.check_add_key_frame(f)
            return False

        prev_f = self.mp.frames[-2]
        # One KNN match per frame, in (prev, cur) order so the keyframe score
        # can reuse it when the last keyframe is the previous frame.
        if match_from_prev is not None:
            l_prev, l_cur = match_from_prev
        else:
            l_prev, l_cur = match_frame_kps(prev_f, f)
        for idx1, idx2 in zip(l_cur, l_prev):
            if idx1 in f.pts:
                continue
            if idx2 in prev_f.pts:
                pt = prev_f.pts[idx2]
                if pt.valid and f not in pt.frames:
                    pt.add_observation(f, idx1)
            else:
                pt = Point(self.mp)
                pt.add_observation(f, idx1)
                pt.add_observation(prev_f, idx2)

        return self.mp.check_add_key_frame(f, match_from_prev=(l_prev, l_cur))

    def trajectory(self) -> np.ndarray:
        """Global camera-to-world poses of all frames ([N, 4, 4]).

        Keyframe poses are the BA-corrected values; non-keyframes ride their
        anchor keyframe (``Frame.current_pose``), so backend corrections
        shift whole inter-keyframe segments rigidly instead of opening
        discontinuities at the keyframes."""
        self.mp.flush_ba()  # land any pipelined BA before reading poses
        return np.stack(
            [np.linalg.inv(f.current_pose()) for f in self.mp.frames]
        )
