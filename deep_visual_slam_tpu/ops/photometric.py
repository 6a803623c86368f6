"""Photometric losses (SSIM, reprojection, edge-aware smoothness), NHWC.

Parity targets:
  - SSIM: reflection-pad(1) + 3x3 average pooling, C1=0.01^2, C2=0.03^2,
    output clamp((1-SSIM)/2, 0, 1)  (reference ``vo/learner_func.py:177-207``)
  - reprojection loss = ssim_ratio * SSIM + (1-ssim_ratio) * L1, channel-mean
    (reference ``vo/learner_new.py:60-74``)
  - edge-aware smoothness on mean-normalized disparity
    (reference ``vo/learner_func.py:161-174`` + normalization at
    ``vo/learner_new.py:246-249``)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C1 = 0.01**2
_C2 = 0.03**2


def _avg_pool3x3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 / stride-1 / VALID average pool over NHWC H,W dims.

    Written as a sum of 9 shifted slices: fully reverse-differentiable and
    fused by XLA into a single VPU pass (reduce_window-add lacks a transpose
    rule on this path).
    """
    H, W = x.shape[1], x.shape[2]
    s = None
    for i in range(3):
        for j in range(3):
            piece = x[:, i : i + H - 2, j : j + W - 2, :]
            s = piece if s is None else s + piece
    return s / jnp.array(9.0, x.dtype)


def ssim(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel SSIM *loss* map: clamp((1 - SSIM(x, y)) / 2, 0, 1).

    x, y: [B, H, W, C] in [0, 1]. Output same shape. Uses reflection padding
    so the output resolution matches the input, exactly like the reference's
    ``ReflectionPad2d(1)`` + ``AvgPool2d(3, 1)``.
    """
    pad = ((0, 0), (1, 1), (1, 1), (0, 0))
    x = jnp.pad(x, pad, mode="reflect")
    y = jnp.pad(y, pad, mode="reflect")

    mu_x = _avg_pool3x3(x)
    mu_y = _avg_pool3x3(y)
    sigma_x = _avg_pool3x3(x * x) - mu_x * mu_x
    sigma_y = _avg_pool3x3(y * y) - mu_y * mu_y
    sigma_xy = _avg_pool3x3(x * y) - mu_x * mu_y

    ssim_n = (2.0 * mu_x * mu_y + _C1) * (2.0 * sigma_xy + _C2)
    ssim_d = (mu_x * mu_x + mu_y * mu_y + _C1) * (sigma_x + sigma_y + _C2)
    return jnp.clip((1.0 - ssim_n / ssim_d) * 0.5, 0.0, 1.0)


def reprojection_loss(
    pred: jnp.ndarray, target: jnp.ndarray, ssim_ratio: float = 0.85
) -> jnp.ndarray:
    """Monodepth2 reprojection loss map.

    pred/target: [B, H, W, C] -> [B, H, W, 1]
    ``ssim_ratio * mean_c(SSIM) + (1 - ssim_ratio) * mean_c(|diff|)``
    (reference ``vo/learner_new.py:60-74``).
    """
    l1 = jnp.mean(jnp.abs(target - pred), axis=-1, keepdims=True)
    ssim_l = jnp.mean(ssim(pred, target), axis=-1, keepdims=True)
    return ssim_ratio * ssim_l + (1.0 - ssim_ratio) * l1


def smooth_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware first-order smoothness, scalar.

    disp: [B, H, W, 1], img: [B, H, W, 3]
    (reference ``vo/learner_func.py:161-174``). Disparity normalization is the
    caller's job (see :func:`normalized_smooth_loss`).
    """
    grad_disp_x = jnp.abs(disp[:, :, :-1, :] - disp[:, :, 1:, :])
    grad_disp_y = jnp.abs(disp[:, :-1, :, :] - disp[:, 1:, :, :])

    grad_img_x = jnp.mean(
        jnp.abs(img[:, :, :-1, :] - img[:, :, 1:, :]), axis=-1, keepdims=True
    )
    grad_img_y = jnp.mean(
        jnp.abs(img[:, :-1, :, :] - img[:, 1:, :, :]), axis=-1, keepdims=True
    )

    grad_disp_x = grad_disp_x * jnp.exp(-grad_img_x)
    grad_disp_y = grad_disp_y * jnp.exp(-grad_img_y)
    return jnp.mean(grad_disp_x) + jnp.mean(grad_disp_y)


def normalized_smooth_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Smoothness on mean-normalized disparity.

    ``norm_disp = disp / (clamp(mean(disp), 0.001) + 1e-7)`` matching the
    reference's normalization (``vo/learner_new.py:246-249``).
    """
    mean_disp = jnp.mean(disp, axis=(1, 2), keepdims=True)
    mean_disp = jnp.maximum(mean_disp, 0.001)
    norm_disp = disp / (mean_disp + 1e-7)
    return smooth_loss(norm_disp, img)
