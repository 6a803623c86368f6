"""Pose-prior / Huber Pareto sweep (VERDICT r4 #6).

Round-4 finding: from NETWORK init, windowed BA improves ATE (−31.5%) but
worsens RPE-pos +58% (drift redistribution). This sweep maps the trade-off
surface over (``pose_prior_weight``, ``huber_delta``) on the same protocol
as the net-init ablation (multidepth scenes, trained 640x480 checkpoint) —
either there is a config where ATE improves without the RPE-pos regression
(adopt it), or the recorded Pareto front shows none exists (bound it).

Run on the TPU host:
  python scripts/prior_pareto.py --vo_ckpt results/fixture640/weights/<ckpt>
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import scripts.ba_ablation as abl


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--size", type=int, nargs=2, default=(480, 640),
                    metavar=("H", "W"))
    ap.add_argument("--seeds", type=int, nargs="+", default=[100, 101, 102])
    ap.add_argument("--vo_ckpt", default=None)
    ap.add_argument("--weights", type=float, nargs="+",
                    default=[0.0, 1e2, 1e3, 1e4])
    ap.add_argument("--deltas", type=float, nargs="+",
                    default=[0.05, 0.11])
    ap.add_argument("--step_translation", type=float, default=0.02)
    ap.add_argument("--step_rotation", type=float, default=0.004)
    ap.add_argument("--out_json", default="docs/prior_pareto_r05.json")
    args = ap.parse_args()
    abl.H, abl.W = args.size

    from deep_visual_slam_tpu.data.synthetic import (
        synthetic_multidepth_sequence,
    )
    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    nn, provenance = abl.load_networks(args.vo_ckpt, tuple(args.size))
    nn_factory = lambda: nn  # noqa: E731

    record = {
        "provenance": {
            "protocol": "net-init windowed-BA sweep, same scenes as "
                        "docs/ba_ablation_net_r04.json",
            "weights": provenance,
            "grid": {"pose_prior_weight": args.weights,
                     "huber_delta": args.deltas},
            "seeds": args.seeds,
            "frames": args.frames,
        },
        "per_config": {},
    }

    scenes = {}
    for seed in args.seeds:
        frames, K, gt_cw, _ = synthetic_multidepth_sequence(
            args.frames, abl.H, abl.W, seed=seed,
            step_translation=args.step_translation,
            step_rotation=args.step_rotation,
        )
        scenes[seed] = (frames, K, gt_cw)

    def run_cfg(name, optimize, w=1e3, d=0.11):
        per_seed = []
        for seed, (frames, K, gt_cw) in scenes.items():
            traj, kf_ids, secs = abl.run_once(
                nn_factory, frames, K, optimize, False,
                pose_prior_weight=w, huber_delta=d,
            )
            m = abl.evaluate(traj, gt_cw, kf_ids)
            per_seed.append(m)
            print(f"{name} seed {seed}: {m}", flush=True)
        mean = {
            k: round(float(np.mean([s[k] for s in per_seed if k in s])), 6)
            for k in per_seed[0]
        }
        record["per_config"][name] = {"mean": mean, "per_seed": per_seed}
        return mean

    t0 = time.time()
    base = run_cfg("no_ba", optimize=False)
    for w in args.weights:
        for d in args.deltas:
            m = run_cfg(f"w{w:g}_d{d:g}", optimize=True, w=w, d=d)
            m["ate_vs_no_ba_pct"] = round(
                100 * (m["ate_rmse"] / base["ate_rmse"] - 1), 1
            )
            m["rpe_pos_vs_no_ba_pct"] = round(
                100 * (m["rpe_pos_mean"] / base["rpe_pos_mean"] - 1), 1
            )
    record["seconds"] = round(time.time() - t0, 1)

    os.makedirs(os.path.dirname(args.out_json), exist_ok=True)
    with open(args.out_json, "w") as f:
        json.dump(record, f, indent=1)
    print(json.dumps(
        {k: v["mean"] for k, v in record["per_config"].items()}, indent=1
    ))
    print(f"wrote {args.out_json}")


if __name__ == "__main__":
    main()
