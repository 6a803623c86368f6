"""Per-frame brightness-affine BA variables (ba.photometric_ba
``estimate_affine`` — the D3VO capability the reference stores on its edge
but never exercises: ``/root/reference/slam/MonoVO.py:19-27`` feeds
a=1, b=0 into ``optimizer.py:284-285``).

Under a per-frame gain corruption g_f the photometric residual
``a_d·(g_d·I) − a_h·(g_h·I)`` vanishes at ``a_f ∝ 1/g_f`` — the solver must
recover that (up to the fixed frame-0 gauge and the identity anchor) and the
affine-enabled solve must beat the affine-less one on pose error.
"""

import numpy as np
import jax.numpy as jnp

from deep_visual_slam_tpu.slam.ba import BAProblem, photometric_ba
from tests.test_global_ba import F_REAL, P_REAL, _mini_problem


GAINS = np.array([1.0, 1.12, 0.88, 1.08, 0.92], np.float32)


def _gained_problem(seed=0):
    pb = _mini_problem(seed)
    imgs = pb["images"] * GAINS[:, None, None, None]
    pb["images"] = np.clip(imgs, 0.0, 1.0)
    return pb


def _run(pb, **kw):
    problem = BAProblem(
        images=jnp.asarray(pb["images"]),
        K=pb["K"], poses=pb["poses"], depths=pb["depths"],
        host_uv=pb["host_uv"], host_idx=pb["host_idx"],
        obs_mask=pb["obs_mask"], weight=pb["weight"],
    )
    return photometric_ba(
        problem, num_iters=8, depth_damping=1.0,
        num_real=jnp.asarray(F_REAL, jnp.int32), **kw,
    )


def test_affine_recovers_per_frame_gain():
    pb = _gained_problem()
    pb["poses"] = pb["poses_gt"].copy()  # isolate the affine estimate
    # affine_prior must be small relative to the photometric evidence: the
    # mini problem has only ~40 edges, so a per-frame anchor of 1.0 shrinks
    # the recovered gains ~halfway back to identity (measured: a_1 = 0.943
    # vs expected 0.893). At 0.1 the estimates land within 0.01.
    _, _, diag = _run(pb, estimate_affine=True, affine_prior=0.1)
    ab = np.asarray(diag["ab"])
    # Frame 0 is gauge-fixed at identity; g_0 = 1 so the expected gain is
    # simply 1/g_f for the others.
    np.testing.assert_allclose(ab[0], [1.0, 0.0], atol=1e-6)
    expected = 1.0 / GAINS[1:]
    assert np.all(np.abs(ab[1:, 0] - expected) < 0.05), (ab[:, 0], expected)


def test_affine_beats_no_affine_under_exposure_change():
    pb = _gained_problem(seed=2)
    gt_t = pb["poses_gt"][:, :3, 3]

    def pose_err(poses):
        return float(np.linalg.norm(np.asarray(poses)[:, :3, 3] - gt_t))

    # prior_weight=10: strong enough to hold the monocular gauge, weak
    # enough that photometric evidence can move poses — at 1e3 the odometry
    # prior pins BOTH solves to the init and the comparison is a tie
    # (measured: 0.01508 vs 0.01501). At 10: plain 0.0202, affine 0.0142.
    poses_plain, _, _ = _run(pb, estimate_affine=False, prior_weight=10.0)
    poses_aff, _, _ = _run(
        pb, estimate_affine=True, affine_prior=0.1, prior_weight=10.0
    )
    e_plain = pose_err(poses_plain)
    e_aff = pose_err(poses_aff)
    assert np.isfinite(e_aff)
    assert e_aff < e_plain, (e_aff, e_plain)


def test_affine_off_is_identity_semantics():
    """estimate_affine=False returns ab == identity in the diagnostics and
    matches the historical solver output (covered in depth by the existing
    ba tests; this pins the new diag key)."""
    pb = _mini_problem(seed=4)
    _, _, diag = _run(pb, estimate_affine=False)
    ab = np.asarray(diag["ab"])
    np.testing.assert_allclose(ab[:, 0], 1.0)
    np.testing.assert_allclose(ab[:, 1], 0.0)


def test_affine_stays_identity_without_exposure_change():
    """On exposure-consistent images the anchor must keep (a, b) at
    identity (no spurious gain drift) and poses must stay as good as the
    affine-less solve (within noise)."""
    pb = _mini_problem(seed=6)
    gt_t = pb["poses_gt"][:, :3, 3]
    poses_plain, _, _ = _run(pb, estimate_affine=False, prior_weight=1e3)
    poses_aff, _, diag = _run(
        pb, estimate_affine=True, affine_prior=10.0, prior_weight=1e3
    )
    ab = np.asarray(diag["ab"])
    assert np.all(np.abs(ab[:, 0] - 1.0) < 0.03), ab[:, 0]
    assert np.all(np.abs(ab[:, 1]) < 0.03), ab[:, 1]
    e_plain = float(np.linalg.norm(np.asarray(poses_plain)[:, :3, 3] - gt_t))
    e_aff = float(np.linalg.norm(np.asarray(poses_aff)[:, :3, 3] - gt_t))
    assert e_aff < e_plain * 1.5 + 1e-4, (e_aff, e_plain)
