"""CLI: offline SLAM over a video file or image directory.

Parity target: reference ``slam/main.py`` (``OfflineRunner``): cv2 frame
loop -> MonoVO.process_frame, ORB-match visualization frames, depth-colormap
video, and the matplotlib 3D trajectory display (``slam/display.py``).

Usage:
    python -m deep_visual_slam_tpu.slam_cli --input video.mp4 \
        [--output results/slam] [--max_frames N] [--global_ba]
"""

from __future__ import annotations

import argparse
import glob
import os


def iter_frames(path: str, image_size):
    """Yield RGB uint8 frames from a video file or an image directory.

    uint8 end to end: decode is already uint8, the device upload is 4x
    smaller than fp32, and every jitted consumer (nets, KLT, BA) scales to
    [0,1] on device — the host never runs an astype over full frames."""
    import cv2

    H, W = image_size
    if os.path.isdir(path):
        files = sorted(
            glob.glob(os.path.join(path, "*.jpg"))
            + glob.glob(os.path.join(path, "*.png"))
        )
        for fp in files:
            img = cv2.imread(fp, cv2.IMREAD_COLOR)
            if img is None:
                continue
            img = cv2.resize(img, (W, H))
            yield cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    else:
        cap = cv2.VideoCapture(path)
        while True:
            ok, img = cap.read()
            if not ok:
                break
            img = cv2.resize(img, (W, H))
            yield cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        cap.release()


def depth_colormap(depth, max_depth=10.0):
    import cv2
    import numpy as np

    d = np.clip(depth / max_depth, 0, 1)
    return cv2.applyColorMap((d * 255).astype(np.uint8), cv2.COLORMAP_MAGMA)


def save_trajectory_plot(traj, out_path: str) -> None:
    """matplotlib 3D trajectory (reference ``slam/display.py:24-53``)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig = plt.figure(figsize=(8, 6))
    ax = fig.add_subplot(111, projection="3d")
    p = traj[:, :3, 3]
    ax.plot(p[:, 0], p[:, 1], p[:, 2], "b-")
    ax.scatter(p[0, 0], p[0, 1], p[0, 2], c="g", s=40)
    ax.scatter(p[-1, 0], p[-1, 1], p[-1, 2], c="r", s=40)
    ax.set_title("SLAM trajectory")
    fig.savefig(out_path, dpi=100)
    plt.close(fig)


def main() -> None:
    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    parser = argparse.ArgumentParser(description="Offline monocular SLAM")
    parser.add_argument("--input", required=True, help="video file or image dir")
    parser.add_argument("--output", default="results/slam")
    parser.add_argument("--img_h", type=int, default=480)
    parser.add_argument("--img_w", type=int, default=640)
    parser.add_argument("--fx", type=float, default=525.0)
    parser.add_argument("--fy", type=float, default=525.0)
    parser.add_argument("--cx", type=float, default=None)
    parser.add_argument("--cy", type=float, default=None)
    parser.add_argument("--max_frames", type=int, default=0)
    parser.add_argument("--global_ba", action="store_true")
    parser.add_argument("--depth_video", action="store_true")
    parser.add_argument(
        "--scene_video", action="store_true",
        help="record a follow-cam 3D scene mp4 (growing cloud + trajectory "
        "per keyframe; headless equivalent of the reference's live PyVista "
        "window, utils/viz.py)",
    )
    parser.add_argument(
        "--vo_ckpt", default=None,
        help="orbax checkpoint dir from train_vo.py (default: random init)",
    )
    parser.add_argument(
        "--frontend", choices=("klt", "orb"), default="klt",
        help="klt: device-side tracking fused with the nets (TPU-native "
        "default); orb: reference-parity host ORB+KNN",
    )
    # Backend knobs (defaults = the ablation-validated configuration,
    # BASELINE.md / docs/ba_ablation_r03.json; reference's window constants
    # live at slam/optimizer.py:10-20).
    parser.add_argument(
        "--ba_levels", type=int, nargs="+", default=[2, 1],
        help="BA pyramid downsample factors, coarsest first (default 2 1)",
    )
    parser.add_argument(
        "--depth_damping", type=float, default=1.0,
        help="absolute floor on the depth Hessian diagonal (0 = free "
        "depths, the pure-g2o regime; measured to worsen poses)",
    )
    parser.add_argument(
        "--pose_prior_weight", type=float, default=1e3,
        help="odometry relative-pose prior weight (D3VO Eq. 15)",
    )
    parser.add_argument(
        "--num_kf", type=int, default=7,
        help="windowed-BA keyframe window size",
    )
    parser.add_argument(
        "--max_points", type=int, default=256,
        help="BA point-slot budget per window",
    )
    args = parser.parse_args()

    import cv2
    import numpy as np

    from deep_visual_slam_tpu.slam import MonoVO

    H, W = args.img_h, args.img_w
    cx = args.cx if args.cx is not None else (W - 1) / 2
    cy = args.cy if args.cy is not None else (H - 1) / 2
    K = np.eye(4)
    K[0, 0], K[1, 1], K[0, 2], K[1, 2] = args.fx, args.fy, cx, cy

    if not os.path.exists(args.input):
        parser.error(f"--input path does not exist: {args.input}")

    os.makedirs(args.output, exist_ok=True)
    # Without --depth_video nothing consumes per-frame dense depth, so skip
    # its D2H transfer (keyframes still fetch it for BA).
    from deep_visual_slam_tpu.slam import Networks

    nn = (Networks.from_checkpoint(args.vo_ckpt, image_shape=(H, W))
          if args.vo_ckpt else None)
    vo = MonoVO(
        K, image_shape=(H, W), frontend=args.frontend,
        fetch_depth=args.depth_video or args.frontend == "orb",
        networks=nn,
        ba_levels=tuple(args.ba_levels),
        depth_damping=args.depth_damping,
        pose_prior_weight=args.pose_prior_weight,
        num_kf=args.num_kf,
        max_points=args.max_points,
    )

    writer = None
    if args.depth_video:
        writer = cv2.VideoWriter(
            os.path.join(args.output, "depth.mp4"),
            cv2.VideoWriter_fourcc(*"mp4v"),
            15,
            (W, H),
        )
    viz = None
    if args.scene_video:
        from deep_visual_slam_tpu.utils.viz import Visualizer

        viz = Visualizer(args.output)
        uu, vv = np.meshgrid(np.arange(W, dtype=np.float32),
                             np.arange(H, dtype=np.float32))

    n = 0
    n_kf = 0
    for frame in iter_frames(args.input, (H, W)):
        depth, _, pose, _, _ = vo.process_frame(frame)
        if writer is not None:
            writer.write(depth_colormap(depth))
        if viz is not None and vo.n_keyframes > n_kf and depth is not None:
            n_kf = vo.n_keyframes
            # Host unprojection of the keyframe depth; one follow-cam frame
            # per keyframe grows the cloud in the mp4.
            pts_cam = np.stack(
                [(uu - K[0, 2]) / K[0, 0] * depth,
                 (vv - K[1, 2]) / K[1, 1] * depth, depth], axis=-1
            )
            T_wc = np.linalg.inv(pose)
            viz.add_pose(T_wc)
            colors = (frame.astype(np.float32) / 255.0
                      if frame.dtype == np.uint8 else frame)
            viz.add_pointcloud(pts_cam, colors, T_wc)
            viz.render(follow_cam=True, floor=True)
        n += 1
        if n % 10 == 0:
            print(f"frame {n}: |t| = {np.linalg.norm(pose[:3, 3]):.3f} m, "
                  f"{len(vo.mp.keyframes)} keyframes, {len(vo.mp.points)} points")
        if args.max_frames and n >= args.max_frames:
            break
    if writer is not None:
        writer.release()
    if viz is not None:
        path = viz.save_movie(os.path.join(args.output, "scene.mp4"), fps=5)
        if path:
            print(f"scene video -> {path}")

    if args.global_ba and len(vo.mp.keyframes) >= 2:
        print("running global bundle adjustment...")
        vo.mp.global_bundle_adjustment(K)

    if n == 0:
        print("no frames decoded from input; nothing to do")
        return
    traj = vo.trajectory()
    np.save(os.path.join(args.output, "trajectory.npy"), traj)
    save_trajectory_plot(traj, os.path.join(args.output, "trajectory.png"))
    print(f"processed {n} frames -> {args.output}/trajectory.npy (+png)")


if __name__ == "__main__":
    main()
