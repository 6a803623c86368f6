"""End-to-end VO throughput benchmark (the BASELINE.json north-star metric).

Measures frames/sec/chip of the full monocular-VO inference pipeline at
Redwood resolution (640x480): DepthNet forward + PoseNet forward +
disp->depth + axis-angle->SE3 pose composition — the same per-frame work as
the reference's ``vo/predict.py:63-105`` loop, batched and jitted.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is vs the 60 FPS/chip north-star target (BASELINE.md), since
the reference publishes no numbers.

The axon TPU tunnel adds ~100 ms per dispatch, so the benchmark chains CHUNK
steps inside one jitted scan before synchronizing.
"""

from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_FPS = 60.0  # north-star: >= 60 FPS/chip (BASELINE.md)

# Published per-chip peaks (bf16 matmul FLOP/s, HBM bytes/s) keyed on a
# substring of ``jax.devices()[0].device_kind`` — the roofline denominators.
# Sources: Google TPU system architecture docs / the scaling book.
_CHIP_PEAKS = (
    ("v6", 918e12, 1640e9),       # Trillium / v6e
    ("v5p", 459e12, 2765e9),
    ("v5", 197e12, 819e9),        # v5e ("TPU v5 lite")
    ("v4", 275e12, 1228e9),
    ("v3", 123e12, 900e9),
)


def _chip_peaks() -> tuple:
    """(peak_bf16_flops, peak_hbm_Bps, kind) of device 0, or (None, None,
    kind) for an unknown chip (roofline then reports absolutes only)."""
    kind = jax.devices()[0].device_kind
    low = kind.lower()
    for key, fl, bw in _CHIP_PEAKS:
        if key in low:
            return fl, bw, kind
    return None, None, kind


def _roofline(compiled, n_units: int, unit_seconds: float) -> dict:
    """Roofline record of ONE compiled XLA program from its own cost
    analysis: FLOPs + HBM bytes per unit (frame / step), achieved rates at
    the measured time, % of chip peak, and which resource binds.

    ``compiled``: a jax ``Lowered.compile()`` result (or anything with
    ``cost_analysis()``). ``n_units``: units of work per program execution.
    ``unit_seconds``: measured wall seconds per unit (device time).
    XLA's "bytes accessed" is the post-fusion per-op HBM traffic estimate —
    the right numerator for a bandwidth roofline.
    """
    try:
        ca = compiled.cost_analysis()
    except Exception as e:  # pragma: no cover - backend without the API
        return {"error": f"cost_analysis unavailable: {e}"}
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    flops = float(ca.get("flops", 0.0))
    hbm = float(ca.get("bytes accessed", 0.0))
    fl_u = flops / n_units
    by_u = hbm / n_units
    peak_fl, peak_bw, kind = _chip_peaks()
    out = {
        "device_kind": kind,
        "flops_per_unit": round(fl_u, 0),
        "hbm_bytes_per_unit": round(by_u, 0),
        "arithmetic_intensity_flop_per_byte": round(fl_u / max(by_u, 1), 2),
        "achieved_tflops": round(fl_u / unit_seconds / 1e12, 3),
        "achieved_hbm_GBps": round(by_u / unit_seconds / 1e9, 2),
    }
    if peak_fl:
        mfu = fl_u / unit_seconds / peak_fl
        hbm_util = by_u / unit_seconds / peak_bw
        out["peak_bf16_tflops"] = peak_fl / 1e12
        out["peak_hbm_GBps"] = peak_bw / 1e9
        out["mfu_pct"] = round(100 * mfu, 2)
        out["hbm_util_pct"] = round(100 * hbm_util, 2)
        out["ridge_flop_per_byte"] = round(peak_fl / peak_bw, 1)
        out["binding_resource"] = (
            "hbm_bandwidth" if hbm_util > mfu else "compute_mxu"
        )
    return out


def _sync_scalar(x) -> float:
    """Force a REAL device sync by fetching one scalar (on the axon tunnel,
    ``block_until_ready`` returns before remote execution finishes)."""
    return float(np.asarray(x).reshape(-1)[0])


def _klt_device_components(vo, frames) -> dict:
    """Per-frame DEVICE time of each KLT-SLAM component, measured by chaining
    dependent dispatches inside one jitted scan (one sync amortizes the
    tunnel round-trip over the whole chain; on a locally attached chip the
    result IS the device time). Used for the local-chip FPS model."""
    import jax
    import jax.numpy as jnp

    from deep_visual_slam_tpu.ops.klt import rgb_to_gray, shi_tomasi_corners
    from deep_visual_slam_tpu.slam.ba import photometric_ba

    fe = vo.klt
    N = len(frames)
    frames_dev = jnp.asarray(np.stack(frames))[:, None]  # [N, 1, H, W, 3]

    # 1) fused net + LK-track step (the every-frame dispatch).
    def step_body(carry, cur):
        prev, pyr, uv, alive = carry
        depth, _unc, T, pyr2, uv2, ok = fe._step_fn(prev, pyr, cur, uv, alive)
        return (cur, pyr2, uv2, ok), (T[:, 0, 3], depth.mean())

    @jax.jit
    def run_steps(c, xs):
        c, ys = jax.lax.scan(step_body, c, xs)
        return ys[1][-1]

    init = (
        frames_dev[0], fe._pyramid_fn(frames_dev[0]), fe._uv_dev, fe._alive_dev
    )
    _sync_scalar(run_steps(init, frames_dev))  # compile
    t0 = time.perf_counter()
    _sync_scalar(run_steps(init, frames_dev))
    step_ms = (time.perf_counter() - t0) / N * 1000
    step_roofline = _roofline(
        run_steps.lower(init, frames_dev).compile(),
        n_units=N, unit_seconds=step_ms / 1000.0,
    )

    # 2) Shi-Tomasi detection (keyframes only).
    f0 = frames_dev[0, 0]
    if f0.dtype == jnp.uint8:
        f0 = f0.astype(jnp.float32) / 255.0
    gray = rgb_to_gray(f0)
    R = 16

    def det_body(carry, _):
        pts, score = shi_tomasi_corners(
            gray + 0.0 * carry, fe.P, nms_radius=fe.nms_radius,
            occupied_uv=fe._uv_dev, occupied_mask=fe._alive_dev,
        )
        return score.sum(), None

    @jax.jit
    def run_det(c):
        c, _ = jax.lax.scan(det_body, c, None, length=R)
        return c

    _sync_scalar(run_det(jnp.zeros(())))
    t0 = time.perf_counter()
    _sync_scalar(run_det(jnp.zeros(())))
    detect_ms = (time.perf_counter() - t0) / R * 1000

    # 3) windowed photometric BA (keyframes only), on the final real window.
    vo.mp.flush_ba()
    built = vo.mp._build_problem(
        vo.intrinsic, vo.mp.keyframes[-vo.mp.num_kf:], vo.mp.max_points,
        pad_frames=vo.mp.num_kf,
    )
    ba_ms = None
    if built is not None:
        problem, _ = built

        def ba_body(carry, _):
            p = problem._replace(poses=problem.poses + 0.0 * carry)
            poses, depths, diag = photometric_ba(p, num_iters=6)
            return poses.sum(), None

        @jax.jit
        def run_ba(c):
            c, _ = jax.lax.scan(ba_body, c, None, length=R)
            return c

        _sync_scalar(run_ba(jnp.zeros(())))
        t0 = time.perf_counter()
        _sync_scalar(run_ba(jnp.zeros(())))
        ba_ms = (time.perf_counter() - t0) / R * 1000
        ba_roofline = _roofline(
            run_ba.lower(jnp.zeros(())).compile(),
            n_units=R, unit_seconds=ba_ms / 1000.0,
        )
    else:
        ba_roofline = None

    return {
        "step_ms": step_ms, "detect_ms": detect_ms, "ba_ms": ba_ms,
        "step_roofline": step_roofline, "ba_roofline": ba_roofline,
    }


def _transfer_legs(H: int, W: int, ingest_dtype) -> dict:
    """Measure the per-frame TRANSFER legs the SLAM loop pays:

      H2D  one [1, H, W, 3] frame upload per frame (ingest dtype)
      D2H  one [H, W] f32 depth fetch (per frame with fetch_depth, else
           per keyframe — BA still reads keyframe depth)

    Through the tunnel each leg costs ``rpc_floor + bytes/bw``; timing a
    tiny buffer isolates the floor, and the MARGINAL time of the full-size
    buffer measures the per-byte cost. The local-chip model charges
    transfers two ways: at the measured tunnel marginal bandwidth (a hard
    upper bound — a locally attached chip's PCIe/ICI is strictly faster)
    and at a 12 GB/s PCIe gen3 x16 reference."""
    import jax

    def timed(fn, n=10):
        fn()  # warm (allocator, layout)
        t0 = time.perf_counter()
        for _ in range(n):
            fn()
        return (time.perf_counter() - t0) / n

    tiny = np.zeros(8, np.uint8)
    frame = np.zeros((1, H, W, 3), ingest_dtype)
    # device_put alone may return before the bytes land (async tunnel):
    # force the round-trip by fetching one scalar of the uploaded buffer.
    t_h2d_tiny = timed(lambda: np.asarray(jax.device_put(tiny)[0]))
    t_h2d_frame = timed(
        lambda: np.asarray(jax.device_put(frame)[0, 0, 0, 0])
    )
    dev_depth = jax.device_put(np.zeros((H, W), np.float32))
    dev_tiny = jax.device_put(tiny)
    t_d2h_tiny = timed(lambda: np.asarray(dev_tiny))
    t_d2h_depth = timed(lambda: np.asarray(dev_depth))

    h2d_bytes = int(np.dtype(ingest_dtype).itemsize) * H * W * 3
    d2h_bytes = 4 * H * W
    h2d_marg_s = max(t_h2d_frame - t_h2d_tiny, 1e-9)
    d2h_marg_s = max(t_d2h_depth - t_d2h_tiny, 1e-9)
    return {
        "h2d_frame_bytes": h2d_bytes,
        "d2h_depth_bytes": d2h_bytes,
        "tunnel_h2d_marginal_ms": round(h2d_marg_s * 1000, 3),
        "tunnel_d2h_marginal_ms": round(d2h_marg_s * 1000, 3),
        "tunnel_h2d_bw_GBps": round(h2d_bytes / h2d_marg_s / 1e9, 3),
        "tunnel_d2h_bw_GBps": round(d2h_bytes / d2h_marg_s / 1e9, 3),
        "rpc_floor_ms": round(min(t_h2d_tiny, t_d2h_tiny) * 1000, 1),
    }


def slam_bench(
    n_frames: int = 48,
    warmup: int = 10,
    frontend: str = "klt",
    fetch_depth: bool = True,
    vo_ckpt: str | None = None,
    step_translation: float = 0.01,
    step_rotation: float = 0.002,
    uint8_ingest: bool = True,
    out_json: str = "docs/bench_slam_r05.json",
) -> None:
    """Time the FULL SLAM loop — ``MonoVO.process_frame`` (fused depth+pose+
    track dispatch, keyframe policy, jitted windowed BA; or the
    reference-parity ORB path) — over a synthetic textured 640x480 sequence.

    Reports the measured end-to-end tunnel number with the per-stage split,
    and (KLT) a local-chip FPS model from chained-dispatch DEVICE times PLUS
    explicitly measured transfer legs (H2D frame upload, D2H depth fetch):
    ``local_ms = step + host + transfers + kf_rate*(detect + ba + build)``,
    with transfers charged at the measured tunnel marginal bandwidth (upper
    bound) and at a 12 GB/s PCIe reference, and a (kf_rate x fetch_depth)
    sensitivity table. ``step_translation``/``step_rotation`` control camera
    motion, i.e. the realized keyframe rate. ``uint8_ingest`` feeds uint8
    frames (the video-decode dtype; 4x fewer H2D bytes than fp32).
    The full record is written to ``out_json`` (durable artifact).
    """
    from deep_visual_slam_tpu.data.synthetic import (
        default_intrinsics,
        synthetic_slam_sequence,
    )
    from deep_visual_slam_tpu.slam.monovo import MonoVO

    H, W = 480, 640
    frames, K, _ = synthetic_slam_sequence(
        n_frames + warmup, H, W, seed=0,
        step_translation=step_translation, step_rotation=step_rotation,
    )
    if uint8_ingest:
        frames = [(np.clip(f, 0, 1) * 255).astype(np.uint8) for f in frames]
    from deep_visual_slam_tpu.slam import Networks

    nn = (Networks.from_checkpoint(vo_ckpt, image_shape=(H, W))
          if vo_ckpt else None)
    vo = MonoVO(
        default_intrinsics(H, W), image_shape=(H, W), frontend=frontend,
        fetch_depth=fetch_depth, networks=nn,
    )

    for f in frames[:warmup]:  # compiles the fused net step + the BA program
        vo.process_frame(f)
    vo.timings = {k: 0.0 for k in vo.timings}
    vo.mp.build_s = 0.0
    kf_before = vo.n_keyframes

    start = time.perf_counter()
    for f in frames[warmup:]:
        vo.process_frame(f)
    elapsed = time.perf_counter() - start

    fps = n_frames / elapsed
    stage_ms = {k: round(v / n_frames * 1000, 2) for k, v in vo.timings.items()}
    kf = vo.n_keyframes - kf_before
    record = {
        "metric": f"slam_e2e_fps_per_chip_640x480_{frontend}",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "per_frame_ms": stage_ms,
        "keyframes": kf,
        "frames": n_frames,
        "fetch_depth": fetch_depth,
        "uint8_ingest": uint8_ingest,
        "step_translation": step_translation,
        "step_rotation": step_rotation,
    }

    if frontend == "klt":
        dev = _klt_device_components(vo, frames[warmup:])
        kf_rate = kf / n_frames
        host_ms = stage_ms["frontend"]
        # Host BA-problem assembly: per KEYFRAME (it only runs there), a
        # cost a local chip cannot hide — charged into the model alongside
        # the device solve.
        build_ms = vo.mp.build_s / max(kf, 1) * 1000
        legs = _transfer_legs(H, W, np.uint8 if uint8_ingest else np.float32)
        record["transfer_legs"] = legs

        def model(kfr: float, fetch: bool, h2d_ms: float, d2h_ms: float):
            # Depth D2H: every frame with fetch_depth, keyframes only
            # without (the BA problem reads keyframe host depth either way).
            d2h = d2h_ms if fetch else kfr * d2h_ms
            ms = (
                dev["step_ms"] + host_ms + h2d_ms + d2h
                + kfr * (dev["detect_ms"] + (dev["ba_ms"] or 0.0) + build_ms)
            )
            return round(ms, 3), round(1000.0 / ms, 1)

        pcie_bw = 12e9  # PCIe gen3 x16 reference for a locally attached chip
        h2d_pcie = legs["h2d_frame_bytes"] / pcie_bw * 1000
        d2h_pcie = legs["d2h_depth_bytes"] / pcie_bw * 1000
        sens = {}
        for kfr in sorted({round(kf_rate, 3), 0.25, 0.5, 1.0}):
            for fetch in (True, False):
                ms_t, fps_t = model(
                    kfr, fetch, legs["tunnel_h2d_marginal_ms"],
                    legs["tunnel_d2h_marginal_ms"],
                )
                ms_p, fps_p = model(kfr, fetch, h2d_pcie, d2h_pcie)
                sens[f"kf{kfr}_fetch{int(fetch)}"] = {
                    "fps_transfers_at_tunnel_bw": fps_t,
                    "fps_transfers_at_pcie12": fps_p,
                    "ms_tunnel_bw": ms_t,
                    "ms_pcie12": ms_p,
                }
        ms_meas, fps_meas = model(
            kf_rate, fetch_depth, legs["tunnel_h2d_marginal_ms"],
            legs["tunnel_d2h_marginal_ms"],
        )
        record["device_ms"] = {k: None if v is None else round(v, 3)
                               for k, v in dev.items()
                               if not k.endswith("roofline")}
        # Roofline of the two device programs (fused net+track step; the
        # windowed BA solve): MFU%, HBM%, binding resource (VERDICT r4 #5).
        record["roofline"] = {
            "fused_step": dev["step_roofline"],
            "windowed_ba": dev["ba_roofline"],
        }
        record["ba_build_host_ms_per_kf"] = round(build_ms, 3)
        record["keyframe_rate"] = round(kf_rate, 3)
        record["local_chip_model"] = {
            "ms_per_frame": ms_meas,
            "fps": fps_meas,
            "formula": "step + host_frontend + h2d_frame + d2h_depth "
                       "+ kf_rate*(detect + ba + build); transfers at "
                       "measured tunnel marginal bw (upper bound)",
            "sensitivity": sens,
        }

    print(json.dumps(record))
    if out_json:
        os.makedirs(os.path.dirname(out_json), exist_ok=True)
        with open(out_json, "w") as f:
            json.dump(record, f, indent=1)


def train_bench(
    steps: int = 24,
    batch_size: int = 8,
    source: str = "packed",
    packed_root: str = "results/packed",
    size=(480, 640),
    device_augment: bool = False,
    uint8_h2d: bool = False,
    accum_steps: int = 1,
    out_json: str = "docs/bench_train_r05.json",
) -> None:
    """END-TO-END training throughput INCLUDING the host input pipeline.

    The README's headline training number is synchronized device time; this
    measures what a real run sustains on this host — loader (decode or
    memmap read + jitter + collate), H2D transfer, and the whole-step jitted
    update — for the packed-record path (``data/packed.py``) or the
    synthetic generator. frames/s = 3*batch (a snippet is 3 frames; matches
    the device-time accounting in README).

    ``steps`` must span several EPOCHS to be a steady-state number: the
    loader's per-epoch ``ThreadPoolExecutor.map`` submits the whole epoch
    eagerly, so the multi-minute first-step compile lets the workers
    pre-buffer up to one full epoch (62 batches for the default packed
    fixture) — a 24-step window then excludes nearly all host work (measured:
    52 steps/s at steps=24 vs the honest 3.06 steps/s at steps=240).
    """
    import os as _os

    import jax as _jax

    from deep_visual_slam_tpu.data.loader import DataLoader, device_prefetch
    from deep_visual_slam_tpu.models import DepthNet, PoseNet
    from deep_visual_slam_tpu.training import init_vo_models
    from deep_visual_slam_tpu.training.state import TrainState, make_optimizer
    from deep_visual_slam_tpu.training.steps import make_vo_train_step
    from deep_visual_slam_tpu.training.vo_learner import VOLossConfig

    H, W = size
    if source == "packed":
        from deep_visual_slam_tpu.data.packed import (
            PackedSnippetDataset,
            list_packed_scenes,
        )

        scenes = list_packed_scenes(_os.path.join(packed_root, "train"))
        if not scenes:
            from scripts.pack_dataset import pack_synthetic

            print(f"# packing 8 synthetic scenes into {packed_root} ...")
            pack_synthetic(packed_root, 8, 64, (H, W))
            scenes = list_packed_scenes(_os.path.join(packed_root, "train"))
        from deep_visual_slam_tpu.data.loader import ConcatDataset

        sets = [PackedSnippetDataset(s, (H, W), augment=not device_augment)
                for s in scenes]
        if uint8_h2d:
            for ds in sets:
                ds.output_uint8 = True
                ds.augment = False
        dataset = ConcatDataset(sets)
    else:
        from deep_visual_slam_tpu.data.synthetic import SyntheticVoDataset

        dataset = SyntheticVoDataset((H, W), length=(steps + 4) * batch_size)

    loader = DataLoader(dataset, batch_size, shuffle=True, num_workers=8)

    depth_model = DepthNet(dtype=jnp.bfloat16)
    pose_model = PoseNet(dtype=jnp.bfloat16)
    variables = init_vo_models(
        depth_model, pose_model, (H, W), jax.random.PRNGKey(0)
    )
    tx = make_optimizer(init_lr=1e-4, total_steps=10_000)
    state = TrainState.create(variables["params"], variables["batch_stats"], tx)
    train_step = make_vo_train_step(
        depth_model, pose_model, VOLossConfig(),
        device_augment=device_augment, accum_steps=accum_steps,
    )
    rng = jax.random.PRNGKey(1)

    done = 0
    t_start = None
    while done < steps + 1:
        for batch in device_prefetch(loader):
            rng, sub = jax.random.split(rng)
            state, losses = train_step(state, batch, sub)
            done += 1
            if done == 1:  # compile + first dispatch excluded
                _jax.block_until_ready(losses)
                t_start = time.perf_counter()
            if done >= steps + 1:
                break
    _jax.block_until_ready(losses)
    elapsed = time.perf_counter() - t_start
    fps = steps * batch_size * 3 / elapsed

    # Pure-DEVICE step time (same batch re-dispatched, host pipeline
    # excluded) + roofline of the compiled train step: MFU%, HBM%, and the
    # binding resource (VERDICT r4 #5; substantiates the r03
    # "bandwidth-bound at the HBM wall" claim with numbers).
    rng, sub = jax.random.split(rng)
    dev_batch = jax.device_put(batch)
    compiled = train_step.lower(state, dev_batch, sub).compile()
    n_dev = 6
    for _ in range(2):  # warm
        state, losses = train_step(state, dev_batch, sub)
    _jax.block_until_ready(losses)
    t0 = time.perf_counter()
    for _ in range(n_dev):
        state, losses = train_step(state, dev_batch, sub)
    _jax.block_until_ready(losses)
    dev_step_s = (time.perf_counter() - t0) / n_dev
    roof = _roofline(compiled, n_units=1, unit_seconds=dev_step_s)
    roof["device_steps_per_sec"] = round(1.0 / dev_step_s, 3)

    tag = f"{source}_devaug" if device_augment else source
    if uint8_h2d:
        tag += "_u8"
    if accum_steps > 1:
        tag += f"_accum{accum_steps}"  # effective batch = bs * accum
    record = {
        "metric": f"vo_train_host_included_fps_{W}x{H}_bs{batch_size}_{tag}",
        "value": round(fps, 2),
        "unit": "frames/sec (3 frames per snippet)",
        "vs_baseline": round(fps / BASELINE_FPS, 3),
        "steps_per_sec": round(steps / elapsed, 3),
        "steps": steps,
        "final_loss": float(np.asarray(losses["loss"])),
        "roofline": roof,
    }
    print(json.dumps(record))
    if out_json:
        os.makedirs(os.path.dirname(out_json), exist_ok=True)
        mode = "r+" if os.path.exists(out_json) else "w"
        existing = []
        if mode == "r+":
            with open(out_json) as f:
                try:
                    existing = json.load(f)
                except Exception:
                    existing = []
            if not isinstance(existing, list):
                existing = [existing]
        existing.append(record)
        with open(out_json, "w") as f:
            json.dump(existing, f, indent=1)


def main() -> None:
    from deep_visual_slam_tpu.models import DepthNet, PoseNet
    from deep_visual_slam_tpu.ops import (
        disp_to_depth,
        transformation_from_parameters,
    )
    from deep_visual_slam_tpu.training import init_vo_models

    H, W, B = 480, 640, 1
    dtype = jnp.bfloat16
    depth_model = DepthNet(dtype=dtype)
    pose_model = PoseNet(dtype=dtype)
    variables = init_vo_models(depth_model, pose_model, (H, W), jax.random.PRNGKey(0))
    params, stats = variables["params"], variables["batch_stats"]

    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))
    prev = jnp.asarray(rng.uniform(size=(B, H, W, 3)).astype(np.float32))

    from deep_visual_slam_tpu.models.fused_vo import make_fused_vo_apply

    fused_apply = make_fused_vo_apply(depth_model, pose_model)

    def vo_frame(carry, _):
        world_T, frame, prev_frame = carry
        disps, (aa, t) = fused_apply(
            {"params": params["depth"], "batch_stats": stats["depth"]},
            {"params": params["pose"], "batch_stats": stats["pose"]},
            frame, prev_frame,
        )
        _, depth = disp_to_depth(disps[("disp", 0)], 0.1, 10.0)
        T = transformation_from_parameters(aa[:, 0, 0], t[:, 0, 0])
        world_T = world_T @ T
        # Feed the depth back so the chain can't be dead-code-eliminated.
        frame = frame + 0.0 * depth.mean()
        return (world_T, prev_frame, frame), world_T[:, 0, 3]

    CHUNK = 32

    @jax.jit
    def run_chunk(world_T, frame, prev_frame):
        (world_T, f, p), xs = jax.lax.scan(
            vo_frame, (world_T, frame, prev_frame), None, length=CHUNK
        )
        return world_T, xs

    world_T = jnp.tile(jnp.eye(4), (B, 1, 1))
    # Warm-up / compile.
    out, _ = run_chunk(world_T, frames, prev)
    out.block_until_ready()

    n_chunks = 8
    start = time.perf_counter()
    for _ in range(n_chunks):
        out, _ = run_chunk(out, frames, prev)
    out.block_until_ready()
    elapsed = time.perf_counter() - start

    total_frames = n_chunks * CHUNK * B
    fps = total_frames / elapsed
    # Roofline: FLOPs + HBM bytes of the compiled chunk program, per frame,
    # against chip peaks — turns the FPS headline into an engineering
    # statement of remaining headroom (VERDICT r4 #5).
    roof = _roofline(
        run_chunk.lower(world_T, frames, prev).compile(),
        n_units=CHUNK * B,
        unit_seconds=elapsed / total_frames,
    )
    print(
        json.dumps(
            {
                "metric": "vo_e2e_fps_per_chip_640x480",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / BASELINE_FPS, 3),
                "roofline": roof,
            }
        )
    )


if __name__ == "__main__":
    import argparse

    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--slam", action="store_true",
                    help="bench the full SLAM loop instead of the net stack")
    ap.add_argument("--frontend", choices=("klt", "orb"), default="klt")
    ap.add_argument("--frames", type=int, default=48)
    ap.add_argument("--no_fetch_depth", action="store_true",
                    help="skip the per-frame dense-depth D2H (KLT only)")
    ap.add_argument("--step_translation", type=float, default=0.01,
                    help="--slam camera motion per frame (controls kf rate)")
    ap.add_argument("--step_rotation", type=float, default=0.002)
    ap.add_argument("--f32_ingest", action="store_true",
                    help="--slam: upload fp32 frames (legacy; default uint8)")
    ap.add_argument("--vo_ckpt", default=None,
                    help="--slam: run on a trained train_vo.py checkpoint")
    ap.add_argument("--out_json", default=None)
    ap.add_argument("--train", action="store_true",
                    help="bench host-included training throughput")
    ap.add_argument("--source", choices=("packed", "synthetic"),
                    default="packed", help="--train input pipeline")
    ap.add_argument("--packed_root", default="results/packed")
    ap.add_argument("--batch_size", type=int, default=8)
    ap.add_argument("--steps", type=int, default=24)
    ap.add_argument("--device_augment", action="store_true",
                    help="--train: run ColorJitter on-device, host jitter off")
    ap.add_argument("--uint8_h2d", action="store_true",
                    help="--train: ship uint8 batches, scale on device "
                    "(4x fewer H2D bytes; packed source only)")
    ap.add_argument("--accum_steps", type=int, default=1,
                    help="--train: gradient accumulation (effective batch "
                    "= batch_size * accum_steps; the bs16-anchor path)")
    args = ap.parse_args()
    if args.slam:
        slam_bench(
            n_frames=args.frames, frontend=args.frontend,
            fetch_depth=not args.no_fetch_depth, vo_ckpt=args.vo_ckpt,
            step_translation=args.step_translation,
            step_rotation=args.step_rotation,
            uint8_ingest=not args.f32_ingest,
            out_json=args.out_json or "docs/bench_slam_r05.json",
        )
    elif args.train:
        train_bench(
            steps=args.steps, batch_size=args.batch_size, source=args.source,
            packed_root=args.packed_root,
            device_augment=args.device_augment,
            uint8_h2d=args.uint8_h2d,
            accum_steps=args.accum_steps,
            out_json=args.out_json or "docs/bench_train_r05.json",
        )
    else:
        main()
