"""SE(3)/SO(3) op tests: round trips, closed forms, scipy cross-checks."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from deep_visual_slam_tpu.ops import se3


def test_rotation_matches_scipy(rng):
    vec = rng.normal(size=(16, 3)).astype(np.float32) * 0.5
    R = np.asarray(se3.rotation_from_axisangle(jnp.asarray(vec)))
    R_ref = Rotation.from_rotvec(vec).as_matrix()
    np.testing.assert_allclose(R, R_ref, atol=1e-5)


def test_rotation_zero_angle_is_identity():
    R = np.asarray(se3.rotation_from_axisangle(jnp.zeros((2, 3))))
    np.testing.assert_allclose(R, np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-6)


def test_axisangle_roundtrip(rng):
    vec = rng.normal(size=(32, 3)).astype(np.float32)
    vec = vec / np.linalg.norm(vec, axis=-1, keepdims=True)
    vec = vec * rng.uniform(0.01, 3.0, size=(32, 1)).astype(np.float32)
    R = se3.rotation_from_axisangle(jnp.asarray(vec))
    back = np.asarray(se3.axisangle_from_rotation(R))
    np.testing.assert_allclose(back, vec, atol=1e-3)


def test_transformation_invert_is_matrix_inverse(rng):
    aa = rng.normal(size=(8, 3)).astype(np.float32) * 0.1
    t = rng.normal(size=(8, 3)).astype(np.float32) * 0.1
    T_fwd = np.asarray(se3.transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t)))
    T_inv = np.asarray(
        se3.transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t), invert=True)
    )
    prod = T_fwd @ T_inv
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (8, 4, 4)), atol=1e-5)


def test_transformation_composition_rule(rng):
    """invert=False must be T(t) @ R (translation applied after rotation)."""
    aa = np.array([[0.0, 0.0, np.pi / 2]], dtype=np.float32)
    t = np.array([[1.0, 2.0, 3.0]], dtype=np.float32)
    T = np.asarray(se3.transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t)))
    # Rotating the origin then translating: origin maps to t exactly.
    np.testing.assert_allclose(T[0, :3, 3], t[0], atol=1e-6)
    R_ref = Rotation.from_rotvec(aa).as_matrix()[0]
    np.testing.assert_allclose(T[0, :3, :3], R_ref, atol=1e-5)


def test_invert_se3(rng):
    aa = rng.normal(size=(4, 3)).astype(np.float32)
    t = rng.normal(size=(4, 3)).astype(np.float32)
    T = se3.transformation_from_parameters(jnp.asarray(aa), jnp.asarray(t))
    prod = np.asarray(T @ se3.invert_se3(T))
    np.testing.assert_allclose(prod, np.broadcast_to(np.eye(4), (4, 4, 4)), atol=1e-5)


def test_se3_exp_log_roundtrip(rng):
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 0.5
    T = se3.se3_exp(jnp.asarray(xi))
    back = np.asarray(se3.se3_log(T))
    np.testing.assert_allclose(back, xi, atol=1e-3)


def test_se3_exp_zero_is_identity():
    T = np.asarray(se3.se3_exp(jnp.zeros((6,))))
    np.testing.assert_allclose(T, np.eye(4), atol=1e-6)


def test_se3_exp_pure_translation():
    xi = jnp.array([1.0, -2.0, 0.5, 0.0, 0.0, 0.0])
    T = np.asarray(se3.se3_exp(xi))
    np.testing.assert_allclose(T[:3, :3], np.eye(3), atol=1e-6)
    np.testing.assert_allclose(T[:3, 3], [1.0, -2.0, 0.5], atol=1e-6)


def test_se3_exp_derivative_at_zero_is_exact():
    """d(se3_exp)/dxi at xi = 0 must be the exact Lie generators — this is
    the point where the BA retraction linearizes EVERY iteration. The
    reference-parity Rodrigues (`rotation_from_axisangle`, with the
    ``angle + 1e-7`` axis normalization) scales this derivative by ~1e-5,
    which silently froze BA rotation updates; `se3_exp` therefore uses a
    series-safe form whose zero-point derivative is exact."""
    import jax

    J = np.asarray(jax.jacfwd(se3.se3_exp)(jnp.zeros(6)))  # [4, 4, 6]
    # Translation part: dt/drho = I.
    np.testing.assert_allclose(J[:3, 3, :3], np.eye(3), atol=1e-6)
    # Rotation part: dR/dphi_k = k-th so(3) generator.
    gen = np.zeros((3, 3, 3))
    gen[0, 2, 1] = gen[1, 0, 2] = gen[2, 1, 0] = 1.0
    gen[0, 1, 2] = gen[1, 2, 0] = gen[2, 0, 1] = -1.0
    for k in range(3):
        np.testing.assert_allclose(J[:3, :3, 3 + k], gen[k], atol=1e-6)


def test_se3_exp_matches_scipy(rng):
    """Value parity away from zero: rotation block equals scipy's rotvec
    exponential, translation is the left-Jacobian action."""
    xi = rng.normal(size=(16, 6)).astype(np.float32) * 0.6
    T = np.asarray(se3.se3_exp(jnp.asarray(xi)))
    R_ref = Rotation.from_rotvec(xi[:, 3:]).as_matrix()
    np.testing.assert_allclose(T[:, :3, :3], R_ref, atol=1e-5)


def test_se3_inv_closed_form(rng):
    xi = rng.normal(size=(8, 6)).astype(np.float32)
    T = se3.se3_exp(jnp.asarray(xi))
    Tinv = np.asarray(se3.se3_inv(T))
    np.testing.assert_allclose(
        np.einsum("bij,bjk->bik", Tinv, np.asarray(T)),
        np.broadcast_to(np.eye(4), (8, 4, 4)),
        atol=1e-5,
    )
