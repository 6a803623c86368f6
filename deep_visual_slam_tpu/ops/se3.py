"""SE(3) / SO(3) utilities as pure jnp ops.

Behavioral parity targets (semantics only, TPU-native implementation):
  - axis-angle -> rotation (Rodrigues): reference ``vo/learner_func.py:65-104``
  - (axisangle, translation) -> 4x4 with the reference's ``invert`` rule:
    reference ``vo/learner_func.py:29-46``
  - se3 exp/log used by the JAX bundle-adjustment backend (the reference used
    g2o's ``SE3Quat`` exponential map, ``g2opy/g2o/types/slam3d/se3quat.h``).

All functions broadcast over leading batch dimensions and are fp32-safe under
jit; trig is computed in fp32 even if inputs are bf16.
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-7


def _safe_norm(vec: jnp.ndarray) -> jnp.ndarray:
    """||vec|| with a finite derivative at zero (plain norm yields 0/0 NaN
    under autodiff exactly where the BA linearizes: xi = 0)."""
    return jnp.sqrt(jnp.sum(vec * vec, axis=-1, keepdims=True) + 1e-24)


def rotation_from_axisangle(vec: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues' formula: axis-angle vector [..., 3] -> rotation [..., 3, 3].

    Matches the reference's Rodrigues expansion (``vo/learner_func.py:65-104``)
    including the ``angle + 1e-7`` axis normalization (so grads are finite at
    zero rotation).
    """
    vec = vec.astype(jnp.float32)
    angle = _safe_norm(vec)  # [..., 1]
    axis = vec / (angle + _EPS)

    ca = jnp.cos(angle)[..., None]  # [..., 1, 1]
    sa = jnp.sin(angle)[..., None]
    C = 1.0 - ca

    x = axis[..., 0:1, None]
    y = axis[..., 1:2, None]
    z = axis[..., 2:3, None]

    zeros = jnp.zeros_like(x)
    # Skew-symmetric cross-product matrix K, rows stacked on axis -2.
    K = jnp.concatenate(
        [
            jnp.concatenate([zeros, -z, y], axis=-1),
            jnp.concatenate([z, zeros, -x], axis=-1),
            jnp.concatenate([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=jnp.float32)
    outer = jnp.concatenate([x, y, z], axis=-2) * jnp.concatenate(
        [x, y, z], axis=-2
    ).swapaxes(-1, -2)
    return ca * eye + sa * K + C * outer


def axisangle_from_rotation(R: jnp.ndarray) -> jnp.ndarray:
    """Log map SO(3): rotation [..., 3, 3] -> axis-angle [..., 3].

    Numerically safe at angle -> 0 (first-order series) and clamped away from
    angle = pi.
    """
    R = R.astype(jnp.float32)
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos_angle = jnp.clip((trace - 1.0) * 0.5, -1.0 + 1e-6, 1.0 - 1e-6)
    angle = jnp.arccos(cos_angle)  # [...,]
    # Vector part of (R - R^T)/2 = sin(angle) * axis
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    ) * 0.5
    sin_angle = jnp.sin(angle)
    # angle / sin(angle), series-expanded near zero.
    small = angle < 1e-4
    factor = jnp.where(small, 1.0 + angle**2 / 6.0, angle / jnp.where(small, 1.0, sin_angle))
    return w * factor[..., None]


def translation_matrix(t: jnp.ndarray) -> jnp.ndarray:
    """Translation vector [..., 3] -> homogeneous 4x4 [..., 4, 4].

    Parity: reference ``vo/learner_func.py:49-62``.
    """
    t = t.astype(jnp.float32)
    batch = t.shape[:-1]
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), batch + (4, 4))
    return T.at[..., :3, 3].set(t)


def transformation_from_parameters(
    axisangle: jnp.ndarray, translation: jnp.ndarray, invert: bool = False
) -> jnp.ndarray:
    """Network (axisangle, translation) -> 4x4 camera-to-camera transform.

    Exactly the reference composition rule (``vo/learner_func.py:29-46``):
      invert=False: ``M = T(t) @ R``
      invert=True:  ``M = R^T @ T(-t)``
    Inputs are [..., 3]; output is [..., 4, 4].
    """
    R3 = rotation_from_axisangle(axisangle)
    t = translation.astype(jnp.float32)
    if invert:
        R3 = R3.swapaxes(-1, -2)
        t = -t
    batch = R3.shape[:-2]
    R = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), batch + (4, 4))
    R = R.at[..., :3, :3].set(R3)
    T = translation_matrix(t)
    if invert:
        return R @ T
    return T @ R


def invert_se3(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form inverse of a rigid transform [..., 4, 4]."""
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = R.swapaxes(-1, -2)
    ti = -(Rt @ t)
    out = jnp.broadcast_to(jnp.eye(4, dtype=T.dtype), T.shape)
    out = out.at[..., :3, :3].set(Rt)
    return out.at[..., :3, 3:].set(ti)


def _so3_left_jacobian(vec: jnp.ndarray) -> jnp.ndarray:
    """Left Jacobian J of SO(3); se3 exp translation part is J @ rho."""
    vec = vec.astype(jnp.float32)
    angle = _safe_norm(vec)[..., None]  # [..., 1, 1]
    x, y, z = vec[..., 0:1, None], vec[..., 1:2, None], vec[..., 2:3, None]
    zeros = jnp.zeros_like(x)
    K = jnp.concatenate(
        [
            jnp.concatenate([zeros, -z, y], axis=-1),
            jnp.concatenate([z, zeros, -x], axis=-1),
            jnp.concatenate([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    eye = jnp.eye(3, dtype=jnp.float32)
    a2 = angle * angle
    small = angle < 1e-4
    safe = jnp.where(small, 1.0, angle)
    # (1 - cos a)/a^2 and (a - sin a)/a^3, series near zero.
    c1 = jnp.where(small, 0.5 - a2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    c2 = jnp.where(small, 1.0 / 6.0 - a2 / 120.0, (safe - jnp.sin(safe)) / (safe**3))
    return eye + c1 * K + c2 * (K @ K)


def _so3_exp_rotation(phi: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues via series-safe sinc coefficients: ``I + A·K + B·K²`` with
    ``A = sin(a)/a``, ``B = (1−cos a)/a²`` and their Taylor series near zero.

    Unlike :func:`rotation_from_axisangle` (kept bit-parity with the
    reference's ``angle + 1e-7`` axis normalization,
    ``vo/learner_func.py:65-104``), this form has the EXACT derivative
    ``dR/dphi|₀ = [·]ₓ`` at phi = 0 — the point where the BA retraction
    linearizes every iteration. The reference-parity form's epsilon scales
    that derivative by ~1e-5, silently freezing BA rotation updates
    (pinned by ``tests/test_se3.py::test_se3_exp_derivative_at_zero``).
    """
    phi = phi.astype(jnp.float32)
    a2 = jnp.sum(phi * phi, axis=-1)[..., None, None]  # [..., 1, 1]
    a = jnp.sqrt(a2)
    x, y, z = phi[..., 0:1, None], phi[..., 1:2, None], phi[..., 2:3, None]
    zeros = jnp.zeros_like(x)
    K = jnp.concatenate(
        [
            jnp.concatenate([zeros, -z, y], axis=-1),
            jnp.concatenate([z, zeros, -x], axis=-1),
            jnp.concatenate([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    small = a < 1e-4
    safe = jnp.where(small, 1.0, a)
    A = jnp.where(small, 1.0 - a2 / 6.0, jnp.sin(safe) / safe)
    B = jnp.where(small, 0.5 - a2 / 24.0, (1.0 - jnp.cos(safe)) / (safe * safe))
    eye = jnp.eye(3, dtype=jnp.float32)
    return eye + A * K + B * (K @ K)


def se3_exp(xi: jnp.ndarray) -> jnp.ndarray:
    """Exponential map se(3) -> SE(3).

    ``xi = [rho, phi]`` (translation-part first, rotation-part last),
    [..., 6] -> [..., 4, 4]. Used by the LM bundle-adjustment backend in
    place of g2o's ``SE3Quat::exp`` (``g2opy/g2o/types/slam3d/se3quat.h``).
    """
    xi = xi.astype(jnp.float32)
    rho, phi = xi[..., :3], xi[..., 3:]
    R = _so3_exp_rotation(phi)
    J = _so3_left_jacobian(phi)
    t = (J @ rho[..., None])[..., 0]
    batch = xi.shape[:-1]
    T = jnp.broadcast_to(jnp.eye(4, dtype=jnp.float32), batch + (4, 4))
    T = T.at[..., :3, :3].set(R)
    return T.at[..., :3, 3].set(t)


def se3_inv(T: jnp.ndarray) -> jnp.ndarray:
    """Closed-form SE(3) inverse: ``[R t; 0 1]⁻¹ = [Rᵀ −Rᵀt; 0 1]``.

    Exact for rigid transforms and ~10x cheaper than ``jnp.linalg.inv`` on a
    [..., 4, 4] batch (no LU); the BA backend inverts each window pose once
    per linearization with this instead of one general inverse per edge.
    """
    R = T[..., :3, :3]
    t = T[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -(Rt @ t)], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], T.dtype), T.shape[:-2] + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def se3_log(T: jnp.ndarray) -> jnp.ndarray:
    """Log map SE(3) -> se(3): [..., 4, 4] -> [..., 6] (rho first)."""
    phi = axisangle_from_rotation(T[..., :3, :3])
    J = _so3_left_jacobian(phi)
    rho = jnp.linalg.solve(J, T[..., :3, 3:])[..., 0]
    return jnp.concatenate([rho, phi], axis=-1)
