"""Pallas TPU kernel: fused SSIM + L1 reprojection-loss map.

The reprojection loss (reference ``vo/learner_new.py:60-74``) is the hottest
elementwise region of VO training: per scale and frame direction it runs 5
box filters + the SSIM rational + the L1 blend. This kernel computes the
whole map from one VMEM-resident band per grid step (one HBM read per input,
one write per output), channel-major so W rides the 128-lane dimension.

MEASURED VERDICT (TPU v5e, B=8 640x480 fp32): this kernel runs 0.126 ms vs
XLA's 0.026 ms for the identical formula — XLA's automatic fusion already
executes the stencil at HBM speed-of-light, and the band-stacking copy plus
Mosaic overheads lose to it. The framework therefore keeps the XLA path
(``ops.photometric.reprojection_loss``) as the default; this kernel stays as
the validated Pallas reference for when the loss grows stages XLA cannot
fuse (e.g. a future warp+SSIM megakernel with in-kernel DMA gathers), and as
the worked example of the VMEM layout rules (a C=3 minor dim pads 3->128 and
OOMs; band height bounds scoped-VMEM temporaries).

Grid: one program per (batch, row-band); inputs arrive reflect-padded and
band-stacked so each grid step owns a disjoint block.

Backward: ``custom_vjp`` whose backward re-derives exact gradients from the
XLA formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from deep_visual_slam_tpu.ops import photometric

_C1 = 0.01**2
_C2 = 0.03**2


def _kernel5(x_ref, y_ref, out_ref, *, ssim_ratio: float):
    """Band kernel, channel-major: refs [1, 1, C, tile+2, W+2] -> [1, tile, W].

    W sits in the 128-lane minor dimension (C=3 there would pad 3 -> 128 and
    blow VMEM by 42x — the layout lesson of this kernel).
    """
    x = x_ref[0, 0]  # [C, tile+2, W+2]
    y = y_ref[0, 0]
    C, Hp, Wp = x.shape
    H, W = Hp - 2, Wp - 2

    def box3(a):
        s = None
        for i in range(3):
            for j in range(3):
                piece = a[:, i : i + H, j : j + W]
                s = piece if s is None else s + piece
        return s * (1.0 / 9.0)

    mu_x = box3(x)
    mu_y = box3(y)
    sigma_x = box3(x * x) - mu_x * mu_x
    sigma_y = box3(y * y) - mu_y * mu_y
    sigma_xy = box3(x * y) - mu_x * mu_y
    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    ssim_map = jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)
    l1 = jnp.abs(y[:, 1:1 + H, 1:1 + W] - x[:, 1:1 + H, 1:1 + W])
    blended = ssim_ratio * ssim_map + (1.0 - ssim_ratio) * l1
    out_ref[0] = jnp.mean(blended, axis=0)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def reprojection_loss_fused(
    pred, target, ssim_ratio: float = 0.85, interpret: bool = False
):
    """Fused Pallas reprojection-loss map; API-compatible with
    ``ops.photometric.reprojection_loss``. Pass ``interpret=True`` on
    non-TPU backends (pallas has no compiled CPU lowering)."""
    return _forward_bands(pred, target, ssim_ratio, interpret)


def _forward_bands(pred, target, ssim_ratio, interpret=False, band: int = 40):
    # Band height bounds the kernel's scoped-VMEM temporaries (~27 arrays of
    # [C, tile, W]); 40 rows at 640 width stays ~10 MB < the 16 MB limit.
    B, H, W, C = pred.shape
    tile = H
    for cand in (band, 48, 32, 24, 16, 60, 80, 96, 8):
        if H % cand == 0:
            tile = cand
            break
    n_bands = H // tile
    # Channel-major layout (NCHW bands) so W is the lane dimension.
    pad = ((0, 0), (0, 0), (1, 1), (1, 1))
    xp = jnp.pad(
        pred.astype(jnp.float32).transpose(0, 3, 1, 2), pad, mode="reflect"
    )
    yp = jnp.pad(
        target.astype(jnp.float32).transpose(0, 3, 1, 2), pad, mode="reflect"
    )

    def bands(a):  # [B, C, H+2, W+2] -> [B, n_bands, C, tile+2, W+2]
        return jnp.stack(
            [a[:, :, t * tile : t * tile + tile + 2] for t in range(n_bands)],
            axis=1,
        )

    kernel = functools.partial(_kernel5, ssim_ratio=ssim_ratio)
    out = pl.pallas_call(
        kernel,
        grid=(B, n_bands),
        interpret=interpret,
        in_specs=[
            pl.BlockSpec(
                (1, 1, C, tile + 2, W + 2), lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, C, tile + 2, W + 2), lambda b, t: (b, t, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile, W), lambda b, t: (b, t, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, H, W), jnp.float32),
    )(bands(xp), bands(yp))
    return out[..., None]


def _fwd(pred, target, ssim_ratio, interpret):
    return _forward_bands(pred, target, ssim_ratio, interpret), (pred, target)


def _bwd(ssim_ratio, interpret, res, g):
    pred, target = res
    # Exact gradients via the reference XLA formulation (fused by XLA; no
    # extra HBM traffic beyond the recompute).
    _, vjp = jax.vjp(
        lambda p, t: photometric.reprojection_loss(p, t, ssim_ratio),
        pred, target,
    )
    return vjp(g)


reprojection_loss_fused.defvjp(_fwd, _bwd)
