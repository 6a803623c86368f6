"""CLI: Depth-Anything-V2 metric-depth inference on images.

Parity target: reference ``model/depth_anything_v2/test.py`` (standalone
inference smoke over a published checkpoint), promoted to a real entry
point: loads a converted checkpoint (``.pth`` auto-converted + cached via
``utils/pretrained.load_depth_anything_variables``), pads inputs to the
14-pixel patch grid, runs jitted on the accelerator, and writes 16-bit
depth PNGs (mm) plus optional colormaps.

Usage:
    python -m deep_visual_slam_tpu.predict_depth_anything \
        --weights depth_anything_v2_vits.pth --encoder vits \
        --input img_or_dir [--output results/da] [--max_depth 20] [--colormap]
"""

from __future__ import annotations

import argparse
import glob
import os


def main() -> None:
    parser = argparse.ArgumentParser(description="Depth-Anything-V2 inference")
    parser.add_argument("--weights", required=True,
                        help=".pth torch checkpoint or cached .npz")
    parser.add_argument("--encoder", default="vits",
                        choices=["vits", "vitb", "vitl", "vitg"])
    parser.add_argument("--input", required=True, help="image file or dir")
    parser.add_argument("--output", default="results/depth_anything")
    parser.add_argument("--max_depth", type=float, default=20.0)
    parser.add_argument("--colormap", action="store_true",
                        help="also write a magma-colored visualization")
    args = parser.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deep_visual_slam_tpu.models.depth_anything import DepthAnythingV2, PATCH
    from deep_visual_slam_tpu.utils.cache import enable_compilation_cache
    from deep_visual_slam_tpu.utils.pretrained import (
        load_depth_anything_variables,
    )

    enable_compilation_cache()

    if os.path.isdir(args.input):
        files = sorted(
            f for ext in ("*.jpg", "*.jpeg", "*.png")
            for f in glob.glob(os.path.join(args.input, ext))
        )
    else:
        files = [args.input]
    if not files:
        parser.error(f"no images under {args.input}")

    variables = load_depth_anything_variables(args.weights, args.encoder)
    model = DepthAnythingV2(
        encoder=args.encoder, max_depth=args.max_depth, dtype=jnp.bfloat16
    )
    infer = jax.jit(lambda x: model.apply(variables, x))

    os.makedirs(args.output, exist_ok=True)
    for path in files:
        bgr = cv2.imread(path)
        if bgr is None:
            print(f"skipping unreadable {path}")
            continue
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
        H, W = rgb.shape[:2]
        # pad to the 14-px patch grid (one compiled program per padded size)
        Hp = (H + PATCH - 1) // PATCH * PATCH
        Wp = (W + PATCH - 1) // PATCH * PATCH
        padded = np.zeros((Hp, Wp, 3), np.float32)
        padded[:H, :W] = rgb
        depth = np.asarray(infer(jnp.asarray(padded)[None]))[0, :H, :W]

        stem = os.path.splitext(os.path.basename(path))[0]
        out16 = os.path.join(args.output, f"{stem}_depth.png")
        cv2.imwrite(out16, (depth * 1000.0).astype(np.uint16))
        if args.colormap:
            norm = (depth - depth.min()) / max(float(np.ptp(depth)), 1e-6)
            cm = cv2.applyColorMap((norm * 255).astype(np.uint8),
                                   cv2.COLORMAP_MAGMA)
            cv2.imwrite(os.path.join(args.output, f"{stem}_depth_vis.png"), cm)
        print(f"{path}: depth [{depth.min():.2f}, {depth.max():.2f}] m -> {out16}")


if __name__ == "__main__":
    main()
