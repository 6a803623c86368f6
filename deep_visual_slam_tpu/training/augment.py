"""On-device color augmentation: the triplet ColorJitter inside the jitted
train step.

The reference jitters on the host inside 24 torch DataLoader workers
(``vo/dataset/common.py:79-81``); the host path here
(``data/base.py:color_jitter``) matches it exactly. On a weak host the
jitter is the single biggest per-sample cost (cv2 HSV round-trips at
640x480), so the TPU-native fast path moves it into the training step:
per-sample factors are drawn from the step rng and applied to the whole
snippet identically (same semantics as the host path — one draw per
triplet, p=0.5 gate), with elementwise HSV math that XLA fuses into the
input pipeline of the first conv. Parity with the host implementation is
pinned by ``tests/test_training.py::test_device_jitter_matches_host``.

Enable with ``Train.device_augment: True`` — the loader then skips host
jitter and ``make_vo_train_step`` applies this instead.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rgb_to_hsv(rgb: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] RGB in [0,1] -> HSV with H in degrees [0, 360).

    Same convention as ``cv2.cvtColor(f32, COLOR_RGB2HSV)``, which the host
    jitter uses.
    """
    r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
    maxc = jnp.maximum(jnp.maximum(r, g), b)
    minc = jnp.minimum(jnp.minimum(r, g), b)
    c = maxc - minc
    safe_c = jnp.where(c > 0, c, 1.0)
    h = jnp.where(
        maxc == r,
        (g - b) / safe_c % 6.0,
        jnp.where(maxc == g, (b - r) / safe_c + 2.0, (r - g) / safe_c + 4.0),
    )
    h = jnp.where(c > 0, h * 60.0, 0.0)
    s = jnp.where(maxc > 0, c / jnp.where(maxc > 0, maxc, 1.0), 0.0)
    return jnp.stack([h, s, maxc], axis=-1)


def hsv_to_rgb(hsv: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`rgb_to_hsv` (H in degrees)."""
    h, s, v = hsv[..., 0], hsv[..., 1], hsv[..., 2]
    h6 = (h / 60.0) % 6.0
    i = jnp.floor(h6)
    f = h6 - i
    p = v * (1.0 - s)
    q = v * (1.0 - s * f)
    t = v * (1.0 - s * (1.0 - f))
    i = i.astype(jnp.int32)
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [v, q, p, p, t], v)
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [t, v, v, q, p], p)
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4], [p, p, t, v, v], q)
    return jnp.stack([r, g, b], axis=-1)


def apply_color_jitter(images: jnp.ndarray, b, c, s, h) -> jnp.ndarray:
    """Apply jitter factors to a [N, H, W, 3] stack (b/c/s/h scalars).

    Order and formulas mirror ``data/base.py:color_jitter``: brightness
    scale -> contrast about the stack mean -> saturation about luma ->
    hue rotation in HSV degrees, clipping between stages as the host does.
    """
    out = images * b
    mean = out.mean(axis=(1, 2, 3), keepdims=True)
    out = (out - mean) * c + mean
    gray = (
        0.299 * out[..., 0:1] + 0.587 * out[..., 1:2] + 0.114 * out[..., 2:3]
    )
    out = (out - gray) * s + gray
    out = jnp.clip(out, 0.0, 1.0)

    def rotate_hue(x):
        hsv = rgb_to_hsv(x)
        hsv = hsv.at[..., 0].set((hsv[..., 0] + h * 360.0) % 360.0)
        return hsv_to_rgb(hsv)

    out = jax.lax.cond(
        jnp.abs(h) > 1e-6, rotate_hue, lambda x: x, out
    )
    return jnp.clip(out, 0.0, 1.0)


def draw_jitter_factors(
    rng: jax.Array,
    brightness: float = 0.3,
    contrast: float = 0.3,
    saturation: float = 0.3,
    hue: float = 0.2,
):
    """(apply?, b, c, s, h) with the host path's distributions: factors
    uniform in [1-x, 1+x] (clipped at 0), hue uniform in [-hue, hue],
    gate applied with p=0.5."""
    kb, kc, ks, kh, kg = jax.random.split(rng, 5)
    b = jax.random.uniform(
        kb, (), minval=max(0.0, 1 - brightness), maxval=1 + brightness
    )
    c = jax.random.uniform(
        kc, (), minval=max(0.0, 1 - contrast), maxval=1 + contrast
    )
    s = jax.random.uniform(
        ks, (), minval=max(0.0, 1 - saturation), maxval=1 + saturation
    )
    h = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    gate = jax.random.uniform(kg, ()) < 0.5
    return gate, b, c, s, h


def batch_snippet_jitter(batch: dict, rng: jax.Array) -> dict:
    """Jitter source_left/target_image/source_right identically PER SAMPLE
    (the reference jitters the stacked triplet as one tensor). Returns a new
    batch dict; non-image keys pass through."""
    triplet = jnp.stack(
        [batch["source_left"], batch["target_image"], batch["source_right"]],
        axis=1,
    )  # [B, 3, H, W, C]
    B = triplet.shape[0]

    def per_sample(x, key):
        gate, b, c, s, h = draw_jitter_factors(key)
        return jax.lax.cond(
            gate, lambda t: apply_color_jitter(t, b, c, s, h), lambda t: t, x
        )

    keys = jax.random.split(rng, B)
    jittered = jax.vmap(per_sample)(triplet, keys)
    out = dict(batch)
    out["source_left"] = jittered[:, 0]
    out["target_image"] = jittered[:, 1]
    out["source_right"] = jittered[:, 2]
    return out
