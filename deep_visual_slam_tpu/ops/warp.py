"""Bilinear image sampling and resizing in NHWC.

Parity targets:
  - ``F.grid_sample(..., padding_mode="border", align_corners=True)`` used by
    the photometric warp (reference ``vo/learner_new.py:165-170``).
  - ``F.interpolate(..., mode="bilinear", align_corners=False)`` used for
    disparity upsampling (reference ``vo/learner_new.py:136-140``) — this is
    exactly `jax.image.resize`'s half-pixel "linear" convention.
  - ``upsample`` nearest x2 in the depth decoder (reference
    ``model/layers.py`` `upsample`, used at ``model/depthnet.py:82``).

The gather-based sampler below is the XLA path; a fused Pallas
warp+SSIM kernel lives in ``ops/pallas/`` for the hot training loss.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def grid_sample(
    image: jnp.ndarray,
    grid: jnp.ndarray,
    align_corners: bool = True,
    padding_mode: str = "border",
) -> jnp.ndarray:
    """Bilinear sampling of ``image`` at normalized ``grid`` locations.

    Args:
      image: [B, H, W, C].
      grid: [B, Ho, Wo, 2] with (x, y) in [-1, 1].
      align_corners: True matches the reference warp
        (``vo/learner_new.py:165-170``).
      padding_mode: "border" (clamp) or "zeros" (out-of-range reads 0).

    Returns:
      [B, Ho, Wo, C] sampled image.
    """
    B, H, W, C = image.shape
    gx = grid[..., 0].astype(jnp.float32)
    gy = grid[..., 1].astype(jnp.float32)

    if align_corners:
        x = (gx + 1.0) * 0.5 * (W - 1)
        y = (gy + 1.0) * 0.5 * (H - 1)
    else:
        x = ((gx + 1.0) * W - 1.0) * 0.5
        y = ((gy + 1.0) * H - 1.0) * 0.5

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1)
        y = jnp.clip(y, 0.0, H - 1)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    flat = image.reshape(B, H * W, C)
    Bo, Ho, Wo = gx.shape

    def gather(yy, xx):
        # Per-corner validity (torch "zeros" semantics: each out-of-range
        # corner contributes 0 to the bilinear blend). For "border" mode the
        # coords are pre-clamped so valid is all-true and clipping is a no-op.
        valid = (xx >= 0) & (xx <= W - 1) & (yy >= 0) & (yy <= H - 1)
        xx = jnp.clip(xx, 0, W - 1)
        yy = jnp.clip(yy, 0, H - 1)
        idx = (yy * W + xx).reshape(B, Ho * Wo)
        v = jnp.take_along_axis(flat, idx[..., None], axis=1).reshape(B, Ho, Wo, C)
        return v * valid[..., None].astype(v.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    out = top * (1.0 - wy) + bot * wy
    return out.astype(image.dtype)


def resize_bilinear(image: jnp.ndarray, height: int, width: int) -> jnp.ndarray:
    """Bilinear resize, half-pixel centers (= torch align_corners=False).

    Used for disparity upsampling to full resolution
    (reference ``vo/learner_new.py:136-140``).
    """
    B, H, W, C = image.shape
    if H == height and W == width:
        return image
    return jax.image.resize(
        image, (B, height, width, C), method="linear", antialias=False
    )


def resize_bilinear_align_corners(
    image: jnp.ndarray, height: int, width: int
) -> jnp.ndarray:
    """Bilinear resize with corner-aligned sampling — exactly torch
    ``F.interpolate(mode="bilinear", align_corners=True)`` (used by RAFT's
    upflow8 and the DPT fusion/output resizes)."""
    B, H, W, C = image.shape
    if H == height and W == width:
        return image
    xs = jnp.linspace(-1.0, 1.0, width)
    ys = jnp.linspace(-1.0, 1.0, height)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    grid = jnp.broadcast_to(
        jnp.stack([gx, gy], axis=-1), (B, height, width, 2)
    )
    return grid_sample(image, grid, align_corners=True, padding_mode="border")


def _cubic_weights_1d(
    in_size: int, out_size: int, scale: float, a: float = -0.75
):
    """Dense [out_size, in_size] torch-bicubic interpolation matrix
    (align_corners=False, no antialias, border-replicated taps).

    Matches ``F.interpolate(mode="bicubic")`` given an EXPLICIT scale factor
    (torch maps ``src = (dst + 0.5) / scale - 0.5`` with the passed scale when
    ``recompute_scale_factor`` is off — DINOv2 passes the 0.1-offset scale,
    reference ``model/depth_anything_v2/dinov2.py:194-205``). Keys-kernel
    coefficient ``a`` = torch's -0.75. Built in numpy at trace time (static
    shapes); applied as a matmul, which the MXU eats for free at pos-embed
    grid sizes.
    """
    import numpy as _np

    dst = _np.arange(out_size, dtype=_np.float64)
    src = (dst + 0.5) / scale - 0.5
    i0 = _np.floor(src).astype(_np.int64)
    t = src - i0

    def k(x):
        x = _np.abs(x)
        return _np.where(
            x <= 1.0,
            (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
            _np.where(x < 2.0, a * (x**3 - 5.0 * x**2 + 8.0 * x - 4.0), 0.0),
        )

    W = _np.zeros((out_size, in_size), _np.float64)
    for tap in range(-1, 3):
        idx = _np.clip(i0 + tap, 0, in_size - 1)
        w = k(t - tap)
        _np.add.at(W, (dst.astype(_np.int64), idx), w)
    return W.astype(_np.float32)


def resize_bicubic_torch(
    image: jnp.ndarray,
    height: int,
    width: int,
    scale_h: float = None,
    scale_w: float = None,
) -> jnp.ndarray:
    """[B, H, W, C] bicubic resize, exactly torch ``F.interpolate(
    mode="bicubic", align_corners=False, antialias=False)``.

    ``scale_h``/``scale_w`` override the coordinate-mapping scale (torch's
    explicit-scale_factor path); default is ``out / in``. Separable dense
    matmuls — exact, and ideal MXU work at the small grids this serves
    (DINOv2 position embeddings, ≤ 37x37)."""
    B, H, W, C = image.shape
    if H == height and W == width and scale_h is None and scale_w is None:
        return image
    Wh = jnp.asarray(_cubic_weights_1d(H, height, scale_h or height / H))
    Ww = jnp.asarray(_cubic_weights_1d(W, width, scale_w or width / W))
    x = jnp.einsum("oh,bhwc->bowc", Wh, image.astype(jnp.float32))
    return jnp.einsum("ow,bhwc->bhoc", Ww, x).astype(image.dtype)


def space_to_depth2(x: jnp.ndarray) -> jnp.ndarray:
    """[B, 2h, 2w, C] -> [B, h, w, 4C]; channel block = phase py*2+px.

    The layout contract of the phase-fused conv formulations
    (models/depthnet.py, models/resnet.py): B=1 full-res small-C convs run
    near 1% MXU efficiency, so the hot stages compute in this domain.
    """
    B, H, W, C = x.shape
    x = x.reshape(B, H // 2, 2, W // 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H // 2, W // 2, 4 * C)


def depth_to_space2(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth2`."""
    B, h, w, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, h, w, 2, 2, C)
    return x.transpose(0, 1, 3, 2, 4, 5).reshape(B, 2 * h, 2 * w, C)


def upsample_nearest_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor 2x spatial upsample, NHWC.

    Equals torch ``F.interpolate(scale_factor=2, mode="nearest")`` exactly
    for integer 2x (decoder upsample, reference ``model/depthnet.py:82``).
    """
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)
