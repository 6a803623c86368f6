"""BA ablation: does the photometric bundle-adjustment backend IMPROVE
trajectories? (VERDICT r2 item #2)

Runs the full SLAM loop (``MonoVO.process_frame``) over synthetic fixture
scenes with known GT poses (``data/synthetic.py:synthetic_slam_sequence`` —
the same renderer behind the parity fixtures) under three configurations:

  no_ba       optimize=False   — raw network odometry chain
  windowed    optimize=True    — per-keyframe windowed photometric BA
              (reference ``slam/optimizer.py:222-319``)
  global      optimize=True + ``Map.global_bundle_adjustment`` at the end
              (reference ``slam/optimizer.py:99-220``)

and records ATE RMSE (Umeyama sim(3)-aligned — monocular scale ambiguity)
and RPE for each, over both the full trajectory and the keyframe subset
(global BA only writes back keyframe poses). Results go to
``docs/ba_ablation_r03.json`` and are summarized in BASELINE.md.

Optionally ``--vo_ckpt`` points at an orbax checkpoint dir from
``train_vo.py`` so the ablation runs on a trained model instead of random
init (both settings are recorded with provenance).

Run on the TPU host:  python scripts/ba_ablation.py
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 480, 640  # overridden by --size


def load_networks(vo_ckpt: str | None, image_shape):
    from deep_visual_slam_tpu.slam import Networks

    if not vo_ckpt:
        return Networks(image_shape=image_shape), "random-init"
    return (
        Networks.from_checkpoint(vo_ckpt, image_shape=image_shape),
        vo_ckpt,
    )


def _perturb_rel(rel: np.ndarray, rot_noise: np.ndarray,
                 trans_noise: np.ndarray) -> np.ndarray:
    """Left-compose a rotation perturbation (Rodrigues of ``rot_noise``) and
    add ``trans_noise`` — the odometry-noise model for oracle-init runs."""
    th = float(np.linalg.norm(rot_noise))
    if th < 1e-12:
        R = np.eye(3)
    else:
        k = rot_noise / th
        Kx = np.array(
            [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0.0]]
        )
        R = np.eye(3) + np.sin(th) * Kx + (1 - np.cos(th)) * (Kx @ Kx)
    out = np.array(rel, np.float64)
    out[:3, :3] = R @ out[:3, :3]
    out[:3, 3] = out[:3, 3] + trans_noise
    return out


def make_oracle_inits(gt_cw, gt_depths, seed, rot_std_deg, trans_std,
                      depth_noise):
    """Per-frame (oracle_depth, oracle_rel) lists: GT depth (optionally with
    multiplicative noise) + GT relative poses perturbed by odometry noise.
    Deterministic per (scene seed) so every BA config sees the SAME noisy
    initialization — the comparison isolates the backend."""
    rng = np.random.default_rng(10_000 + seed)
    n = len(gt_cw)
    depths, rels = [], [None]
    for i in range(n):
        d = np.asarray(gt_depths[i], np.float32)
        if depth_noise > 0:
            d = d * (1.0 + rng.normal(0, depth_noise, d.shape)).astype(
                np.float32
            )
        depths.append(d)
        if i > 0:
            rel = gt_cw[i] @ np.linalg.inv(gt_cw[i - 1])
            rels.append(
                _perturb_rel(
                    rel,
                    rng.normal(0, np.deg2rad(rot_std_deg), 3),
                    rng.normal(0, trans_std, 3),
                )
            )
    return depths, rels


def run_once(nn_factory, frames, K, optimize: bool, global_ba: bool,
             ba_levels=(2, 1), oracle=None, depth_damping=1.0,
             pose_prior_weight=1e3, frontend="klt",
             estimate_affine=False, huber_delta=0.11, uncs=None):
    """One SLAM pass; returns (traj T_wc [N,4,4], keyframe ids, seconds)."""
    from deep_visual_slam_tpu.slam import MonoVO

    vo = MonoVO(K, image_shape=(H, W), networks=nn_factory(),
                ba_levels=ba_levels, depth_damping=depth_damping,
                pose_prior_weight=pose_prior_weight, frontend=frontend,
                estimate_affine=estimate_affine, huber_delta=huber_delta)
    t0 = time.perf_counter()
    for i, f in enumerate(frames):
        kw = {}
        if oracle is not None:
            kw = dict(oracle_depth=oracle[0][i], oracle_rel=oracle[1][i])
        if uncs is not None:
            kw["oracle_uncertainty"] = uncs[i]
        vo.process_frame(f, optimize=optimize, **kw)
    if global_ba and len(vo.mp.keyframes) >= 2:
        vo.mp.global_bundle_adjustment(K, verbose=False)
    elapsed = time.perf_counter() - t0
    traj = vo.trajectory()
    # ALL keyframes, not just the surviving window (marginalized keyframes
    # are popped from mp.keyframes but keep anchoring their segments).
    kf_ids = sorted(f.id for f in vo.mp.frames if f.anchor is f)
    return traj, kf_ids, elapsed


def evaluate(traj_wc, gt_cw, kf_ids):
    """ATE/RPE of predicted T_wc vs GT (generator emits T_cw -> invert)."""
    from deep_visual_slam_tpu.eval.trajectory import ate_rmse, rpe

    gt_wc = np.linalg.inv(np.asarray(gt_cw, np.float64))
    ate, _, stats = ate_rmse(traj_wc, gt_wc, align=True)
    r = rpe(traj_wc, gt_wc, delta=1)
    out = {
        "ate_rmse": round(stats["ate_rmse"], 6),
        "rpe_pos_mean": round(r["rpe_pos_mean"], 6),
        "rpe_rot_mean_deg": round(r["rpe_rot_mean_deg"], 6),
    }
    # Keyframe-subset ATE: the only poses global BA writes back.
    if len(kf_ids) >= 3:
        _, _, kstats = ate_rmse(traj_wc[kf_ids], gt_wc[kf_ids], align=True)
        out["kf_ate_rmse"] = round(kstats["ate_rmse"], 6)
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640),
                    metavar=("H", "W"))
    ap.add_argument("--seeds", type=int, nargs="+", default=[100, 101, 102])
    ap.add_argument("--vo_ckpt", default=None,
                    help="orbax checkpoint dir from train_vo.py (optional)")
    ap.add_argument("--out_json", default="docs/ba_ablation_r04.json")
    ap.add_argument("--scene", choices=("multidepth", "plane"),
                    default="multidepth",
                    help="multidepth (default): piecewise-planar ray-cast "
                    "scenes — BA-identifiable geometry; plane: the single "
                    "slanted plane (degenerate: plane-induced-homography "
                    "gauge, kept for comparison)")
    ap.add_argument("--step_translation", type=float, default=0.02)
    ap.add_argument("--step_rotation", type=float, default=0.004)
    ap.add_argument("--init", choices=("net", "oracle"), default="net",
                    help="net: the real pipeline (network depth + pose); "
                    "oracle: GT depth + GT-relative-pose odometry with "
                    "injected noise — isolates the BA backend from network "
                    "training state (multidepth scenes only)")
    ap.add_argument("--rot_noise_deg", type=float, default=0.3,
                    help="oracle init: per-frame rotation noise std (deg)")
    ap.add_argument("--trans_noise", type=float, default=0.005,
                    help="oracle init: per-frame translation noise std (m)")
    ap.add_argument("--depth_noise", type=float, default=0.0,
                    help="oracle init: multiplicative depth noise std")
    ap.add_argument("--ba_levels", type=int, nargs="+", default=[2, 1],
                    help="BA pyramid levels, coarsest first (default 2 1 — "
                    "the shipped MonoVO default; 1 = single-scale)")
    ap.add_argument("--frontend", choices=("klt", "orb"), default="klt",
                    help="orb: the reference-parity host frontend (net init "
                    "only — oracle injection requires klt)")
    ap.add_argument("--depth_damping", type=float, default=1.0,
                    help="depth-Hessian floor (Map default 1.0 — network "
                    "depth as a strong prior; 0.0 = free depths, measurably "
                    "worse, see ba.photometric_ba docstring)")
    ap.add_argument("--pose_prior_weight", type=float, default=1e3,
                    help="odometry relative-pose prior weight (D3VO Eq. 15;"
                    " 0.0 disables — weakly-observed frames then take "
                    "accepted aliased steps, see ba.photometric_ba)")
    ap.add_argument("--huber_delta", type=float, default=0.11,
                    help="photometric Huber threshold ([0,1] intensity "
                    "units; the robustness axis of the prior Pareto sweep)")
    ap.add_argument("--estimate_affine", action="store_true",
                    help="estimate per-frame brightness (a, b) inside BA "
                    "(ba.photometric_ba estimate_affine — the D3VO affine "
                    "the reference stores but never exercises)")
    ap.add_argument("--distractor", choices=("none", "flicker", "moving"),
                    default="none",
                    help="add a photometric-violation region to every scene "
                    "(flicker: per-frame gain swings on a distinctively "
                    "textured slab; moving: the slab translates — multidepth "
                    "only). Adds a windowed_ba_unc config row: BA with the "
                    "ORACLE uncertainty map (the distractor mask) feeding "
                    "the D3VO Eq.13 weights that the reference stores but "
                    "feeds zeros (slam/optimizer.py:126,179)")
    ap.add_argument("--oracle_unc_value", type=float, default=24.0,
                    help="uncertainty value inside the distractor mask "
                    "(weight = alpha^2/(alpha^2+unc) with alpha=0.5: 24 -> "
                    "w ~ 0.01; outside the mask unc=0 -> w=1)")
    ap.add_argument("--exposure_ramp", type=float, default=0.0,
                    help="apply a multiplicative exposure ramp across the "
                    "sequence: frame i gain = 1 + ramp*(2*i/(N-1) - 1), "
                    "e.g. 0.3 sweeps gain 0.7 -> 1.3 (the affine-BA "
                    "ablation fixture; 0 = off)")
    args = ap.parse_args()
    global H, W
    H, W = args.size

    from deep_visual_slam_tpu.data.synthetic import (
        synthetic_multidepth_sequence,
        synthetic_slam_sequence,
    )
    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    # Build the networks ONCE (compile cost dominates) and reuse the same
    # weights for every config — the ablation isolates the backend.
    nn, provenance = load_networks(args.vo_ckpt, (H, W))
    nn_factory = lambda: nn  # noqa: E731

    distractor = None if args.distractor == "none" else args.distractor
    if distractor == "moving" and args.scene != "multidepth":
        ap.error("--distractor moving requires --scene multidepth")

    configs = {
        "no_ba": dict(optimize=False, global_ba=False),
        "windowed_ba": dict(optimize=True, global_ba=False),
        "windowed_plus_global_ba": dict(optimize=True, global_ba=True),
    }
    if distractor:
        # BA with the oracle D3VO uncertainty (distractor mask) — isolates
        # the Eq.13 weighting path from uncertainty-head training state.
        configs["windowed_ba_unc"] = dict(
            optimize=True, global_ba=False, oracle_unc=True
        )
        configs["windowed_plus_global_ba_unc"] = dict(
            optimize=True, global_ba=True, oracle_unc=True
        )
    record = {
        "provenance": {
            "data": f"synthetic {args.scene} scenes ({len(args.seeds)} "
                    f"seeds x {args.frames} frames, {W}x{H}, "
                    f"step_translation={args.step_translation} "
                    f"step_rotation={args.step_rotation}; multidepth = "
                    "piecewise-planar ray-cast renders with exact GT "
                    "depth/poses, BA-identifiable geometry)",
            "weights": provenance,
            "init": args.init,
            "frontend": args.frontend,
            "ba_levels": list(args.ba_levels),
            "depth_damping": args.depth_damping,
            "pose_prior_weight": args.pose_prior_weight,
            "estimate_affine": args.estimate_affine,
            "exposure_ramp": args.exposure_ramp,
            "huber_delta": args.huber_delta,
            "distractor": args.distractor,
            "oracle_unc_value": (
                args.oracle_unc_value if distractor else None
            ),
            "oracle_noise": (
                dict(rot_deg=args.rot_noise_deg, trans=args.trans_noise,
                     depth=args.depth_noise)
                if args.init == "oracle" else None
            ),
            "note": "no real Redwood data in this environment (zero "
                    "egress); synthetic scenes are photometrically "
                    "consistent so photometric BA is well-posed on them",
        },
        "per_scene": {},
        "mean": {},
    }

    if args.init == "oracle" and args.scene != "multidepth":
        ap.error("--init oracle requires --scene multidepth (needs GT depth)")
    if args.init == "oracle" and args.frontend == "orb":
        ap.error("--frontend orb supports --init net only (oracle injection "
                 "requires the KLT frontend)")

    for seed in args.seeds:
        masks = None
        if args.scene == "multidepth":
            out = synthetic_multidepth_sequence(
                args.frames, H, W, seed=seed,
                step_translation=args.step_translation,
                step_rotation=args.step_rotation,
                distractor=distractor,
            )
            if distractor:
                frames, K, gt_cw, gt_depths, masks = out
            else:
                frames, K, gt_cw, gt_depths = out
        else:
            out = synthetic_slam_sequence(
                args.frames, H, W, seed=seed,
                step_translation=args.step_translation,
                step_rotation=args.step_rotation,
                distractor=distractor,
            )
            if distractor:
                frames, K, gt_cw, masks = out
            else:
                frames, K, gt_cw = out
        uncs = None
        if masks is not None:
            uncs = [
                (m.astype(np.float32) * args.oracle_unc_value) for m in masks
            ]
        if args.exposure_ramp:
            # Per-frame multiplicative exposure sweeping 1-r -> 1+r — the
            # fixture where photometric BA WITHOUT affine terms degrades
            # (consecutive frames differ by a few % gain) and per-frame
            # (a, b) estimation should recover it.
            nfr = len(frames)
            frames = [
                np.clip(
                    f * (1.0 + args.exposure_ramp * (2 * i / (nfr - 1) - 1)),
                    0.0, 1.0,
                ).astype(np.float32)
                for i, f in enumerate(frames)
            ]
        oracle = None
        if args.init == "oracle":
            oracle = make_oracle_inits(
                gt_cw, gt_depths, seed, args.rot_noise_deg,
                args.trans_noise, args.depth_noise,
            )
        scene = {}
        for name, cfg in configs.items():
            traj, kf_ids, secs = run_once(
                nn_factory, frames, K, cfg["optimize"], cfg["global_ba"],
                ba_levels=tuple(args.ba_levels), oracle=oracle,
                depth_damping=args.depth_damping,
                pose_prior_weight=args.pose_prior_weight,
                frontend=args.frontend,
                estimate_affine=args.estimate_affine,
                huber_delta=args.huber_delta,
                uncs=uncs if cfg.get("oracle_unc") else None,
            )
            m = evaluate(traj, gt_cw, kf_ids)
            m["seconds"] = round(secs, 1)
            m["keyframes"] = len(kf_ids)
            scene[name] = m
            print(f"seed {seed} {name}: {m}", flush=True)
        record["per_scene"][str(seed)] = scene

    for name in configs:
        for key in ("ate_rmse", "rpe_pos_mean", "rpe_rot_mean_deg",
                    "kf_ate_rmse"):
            vals = [s[name][key] for s in record["per_scene"].values()
                    if key in s[name]]
            if vals:
                record["mean"].setdefault(name, {})[key] = round(
                    float(np.mean(vals)), 6
                )

    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(record["mean"], indent=1))
    print(f"wrote {args.out_json}")


if __name__ == "__main__":
    main()
