"""Full-history global bundle adjustment — the scalable (100+ keyframe)
counterpart of the windowed solver in ``slam/ba.py``.

Parity target: reference ``slam/optimizer.py:99-220``
(``global_bundle_adjustment``): ONE photometric BA graph over ALL keyframes,
20 LM iterations run in 3 stages. The reference builds that graph by
re-inserting every keyframe/point into the same g2o hypergraph it uses for
windows — fine for C++ pointer graphs, hopeless as a fixed-shape XLA
program: the windowed solver's dense (point x frame) edge grid and its
one-hot J_full assembly (``ba.py:641-693``) scale as F·P and E·C·F·6. At
F=128, P=2048 that J_full alone is ~2.4 TB. This module replaces the dense
grid with the structure the tracks actually have:

  - **Track-banded edge list.** A SLAM track observes a run of consecutive
    keyframes starting at its host, so edges are laid out as a [P, L] grid:
    edge (p, l) connects point p's host keyframe to the keyframe at offset
    ``l+1`` after it (``obs_off`` masks gaps/track ends). E = P·L instead of
    P·F — independent of trajectory length.
  - **Offset-banded Hessian assembly.** Every edge couples frame pair
    (host, host+1+l), so for each static offset l the per-edge 6x6 blocks
    are placed with ONE [F, P]x[P, 36] matmul (the host one-hot) plus a
    static diagonal shift — L small matmuls on the MXU, zero duplicate-index
    scatters, intermediates bounded by [P, F].
  - Same residual/Jacobian machinery as the windowed solver
    (``edges_evaluate`` / ``edges_jacobian`` — carried-geometry closed-form
    linearization, zero gathers in linearize), same escape-proof LM
    acceptance, same odometry-prior chain (D3VO Eq. 15), same Schur
    complement; the reduced pose system is a dense [6F, 6F] Cholesky
    (768x768 at F=128 — still tiny for the MXU).

Shapes are BUCKETED by the driver (``Map.global_bundle_adjustment``): F pads
to the next bucket so a growing trajectory compiles O(log F) programs, not
one per keyframe count.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.ops.se3 import se3_exp, se3_inv, se3_log
from deep_visual_slam_tpu.slam.ba import (
    bilinear_sample_stack,
    edges_evaluate,
    edges_jacobian,
    huber_weight,
    se3_adjoint,
)


class GlobalBAProblem(NamedTuple):
    """Track-banded global BA problem over the FULL keyframe history.

    images:   [F, C, H, W] CHANNEL-FIRST stack (uint8 or float [0,1]) —
              padded slots zero. Channel-first is load-bearing on TPU: any
              materialized array with minor dim C=3 is tiled T(8,128) with
              the lane padded 3 -> 128 (42.7x HBM — 20 GB at F=128
              full-res); with (H, W) minor the stack is compact
    K:        [4, 4] intrinsics
    poses:    [F, 4, 4] initial T_cw per keyframe
    depths:   [P] initial host depth per point
    host_uv:  [P, 2] (x, y) pixel location in the host keyframe
    host_idx: [P] int32 host keyframe index
    obs_off:  [P, L] bool — point p is observed in keyframe
              ``host_idx[p] + 1 + l``
    weight:   [P] per-point D3VO uncertainty weight  a²/(a²+unc²)
    """

    images: jnp.ndarray
    K: jnp.ndarray
    poses: jnp.ndarray
    depths: jnp.ndarray
    host_uv: jnp.ndarray
    host_idx: jnp.ndarray
    obs_off: jnp.ndarray
    weight: jnp.ndarray


@partial(jax.jit, static_argnames=("num_iters", "scale"))
def photometric_ba_global(
    problem: GlobalBAProblem,
    num_iters: int = 7,
    scale: int = 1,
    huber_delta: float = 0.11,
    init_lambda: float = 1e-4,
    depth_damping: float = 0.0,
    prior_weight: float = 0.0,
    num_real: "jnp.ndarray | None" = None,
    prior_anchor: "jnp.ndarray | None" = None,
):
    """LM over the full keyframe history; returns (poses, depths, diag).

    Semantics match :func:`ba.photometric_ba` (same retraction, gauge fix on
    frame 0, Huber IRLS, escape-proof acceptance, odometry prior, depth
    Hessian floor); only the edge layout and Hessian assembly differ (see
    module docstring). ``scale`` box-pools images / rescales intrinsics
    inside the jit (one dispatch per solve, like ``photometric_ba_scaled``).
    """
    F = problem.poses.shape[0]
    P, L = problem.obs_off.shape
    K = problem.K
    images = problem.images
    if isinstance(images, (tuple, list)):
        images = jnp.stack(images)
    if images.dtype == jnp.uint8:
        images = images.astype(jnp.float32) / 255.0
    host_uv = problem.host_uv
    if scale != 1:
        Fi, C0, H0, W0 = images.shape
        s = scale
        images = images[:, :, : (H0 // s) * s, : (W0 // s) * s].reshape(
            Fi, C0, H0 // s, s, W0 // s, s
        ).mean(axis=(3, 5))
        K = K.at[0, 0].set(K[0, 0] / s)
        K = K.at[1, 1].set(K[1, 1] / s)
        K = K.at[0, 2].set((K[0, 2] + 0.5) / s - 0.5)
        K = K.at[1, 2].set((K[1, 2] + 0.5) / s - 0.5)
        host_uv = (host_uv + 0.5) / s - 0.5

    # ------------------------------------------------- banded edge list
    # Edge (p, l): host_idx[p] -> host_idx[p] + 1 + l. Flattened [P*L].
    offs = jnp.arange(L, dtype=jnp.int32) + 1                    # [L]
    dest_raw = problem.host_idx[:, None] + offs[None, :]         # [P, L]
    e_mask2 = problem.obs_off & (dest_raw < F)
    e_dest = jnp.clip(dest_raw, 0, F - 1).reshape(-1)
    e_point = jnp.broadcast_to(
        jnp.arange(P, dtype=jnp.int32)[:, None], (P, L)
    ).reshape(-1)
    e_host = jnp.broadcast_to(
        problem.host_idx[:, None], (P, L)
    ).reshape(-1)
    e_mask = e_mask2.reshape(-1)
    e_weight = problem.weight[e_point]

    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    dir_p = jnp.stack(
        [
            (host_uv[:, 0] - cx) / fx,
            (host_uv[:, 1] - cy) / fy,
            jnp.ones_like(host_uv[:, 0]),
        ],
        axis=-1,
    )  # [P, 3]
    e_dir = dir_p[e_point]

    # Host intensities: ONE fetch per point, broadcast over its edges.
    I_host_p = jax.vmap(
        lambda hi, uv: bilinear_sample_stack(
            images, hi, uv, channel_first=True
        )
    )(problem.host_idx, host_uv)  # [P, C]
    I_host_e = I_host_p[e_point]

    # ------------------------------------------------- odometry prior
    if prior_anchor is None:
        prior_anchor = problem.poses
    prior_rel = prior_anchor[1:] @ se3_inv(prior_anchor[:-1])
    prior_inv = se3_inv(prior_rel)
    if num_real is None:
        p_mask = jnp.ones(F - 1, jnp.float32)
    else:
        p_mask = ((jnp.arange(F - 1) + 1) < num_real).astype(jnp.float32)
    pw = jnp.asarray(prior_weight, jnp.float32) * p_mask

    def prior_eval(poses):
        T_rel = poses[1:] @ se3_inv(poses[:-1])
        r = se3_log(T_rel @ prior_inv)
        cost = jnp.sum(pw * jnp.sum(r * r, axis=-1))
        return r, T_rel, cost

    def evaluate(poses, depths):
        r, geom = edges_evaluate(
            poses, depths, e_dest, e_host, e_point, e_dir, I_host_e,
            images, K, channel_first=True,
        )
        r_norm = jnp.linalg.norm(r, axis=-1)
        w = (
            huber_weight(r_norm, huber_delta)
            * e_weight
            * e_mask.astype(jnp.float32)
            * geom.ok.astype(jnp.float32)
        )
        chi2 = jnp.sum(w * jnp.sum(r * r, axis=-1))
        return r, w, chi2, geom

    # One-hot host-frame placement [P, F] — the only "scatter" matrix the
    # banded assembly needs (dest placement is this matrix shifted by the
    # STATIC offset l, applied after the contraction).
    onehot_host = (
        problem.host_idx[:, None] == jnp.arange(F)[None, :]
    ).astype(jnp.float32)  # [P, F]

    def build_system(r, w, J_dest, J_host, J_depth, r_prior, T_rel):
        """Offset-banded normal equations (see module docstring).

        All per-edge tensors reshape to the [P, L, ...] grid; for each
        static offset l the frame placement is one [F, P]x[P, ·] matmul
        against ``onehot_host`` plus a shifted static-slice add. H_pp is
        [F, F, 6, 6] (2.4 MB at F=128), H_pd is [P, F, 6].
        """
        C = r.shape[-1]
        rg = r.reshape(P, L, C)
        wg = w.reshape(P, L)
        Jd = J_dest.reshape(P, L, C, 6)
        Jh = J_host.reshape(P, L, C, 6)
        Jz = J_depth.reshape(P, L, C)
        wJd = Jd * wg[..., None, None]
        wJh = Jh * wg[..., None, None]
        wJz = Jz * wg[..., None]

        # Per-edge blocks on the [P, L] grid.
        Bdd = jnp.einsum("plci,plcj->plij", wJd, Jd)   # (dest, dest)
        Bhh = jnp.einsum("plci,plcj->plij", wJh, Jh)   # (host, host)
        Bdh = jnp.einsum("plci,plcj->plij", wJd, Jh)   # (dest, host)
        pd_d = jnp.einsum("plci,plc->pli", wJd, Jz)    # dest-depth
        pd_h = jnp.einsum("plci,plc->pli", wJh, Jz)    # host-depth
        H_dd = jnp.einsum("plc,plc->p", wJz, Jz)
        bp_d = -jnp.einsum("plci,plc->pli", wJd, rg)
        bp_h = -jnp.einsum("plci,plc->pli", wJh, rg)
        b_d = -jnp.einsum("plc,plc->p", wJz, rg)

        H_pp = jnp.zeros((F, F, 6, 6), jnp.float32)
        b_p = jnp.zeros((F, 6), jnp.float32)
        A = jnp.zeros((P, F, 6), jnp.float32)  # H_pd

        # Host-side contributions land at the host index directly.
        Chh = jnp.einsum("pf,plij->fij", onehot_host, Bhh)
        bh = jnp.einsum("pf,pli->fi", onehot_host, bp_h)
        diag = jnp.arange(F)
        H_pp = H_pp.at[diag, diag].add(Chh)
        b_p = b_p + bh
        A = A.at[jnp.arange(P), problem.host_idx].add(pd_h.sum(1))

        # Dest-side contributions: contract on the host one-hot, then shift
        # the frame axis by the static offset (masked edges contribute 0).
        for l in range(L):
            o = l + 1
            if F - o <= 0:
                break
            src = jnp.arange(F - o)
            dst = src + o
            Cdd = jnp.einsum("pf,pij->fij", onehot_host, Bdd[:, l])
            Cdh = jnp.einsum("pf,pij->fij", onehot_host, Bdh[:, l])
            bd = jnp.einsum("pf,pi->fi", onehot_host, bp_d[:, l])
            H_pp = H_pp.at[dst, dst].add(Cdd[: F - o])
            H_pp = H_pp.at[dst, src].add(Cdh[: F - o])
            H_pp = H_pp.at[src, dst].add(
                jnp.swapaxes(Cdh[: F - o], -1, -2)
            )
            b_p = b_p.at[dst].add(bd[: F - o])
            A = A.at[jnp.arange(P), jnp.clip(dest_raw[:, l], 0, F - 1)].add(
                pd_d[:, l]
            )

        # Odometry-prior blocks (identical to ba.py:679-691).
        Ad = se3_adjoint(T_rel)
        AdTAd = jnp.einsum("fki,fkj->fij", Ad, Ad)
        AdTr = jnp.einsum("fji,fj->fi", Ad, r_prior)
        idx = jnp.arange(F - 1)
        pwb = pw[:, None, None]
        H_pp = H_pp.at[idx, idx].add(pwb * AdTAd)
        H_pp = H_pp.at[idx + 1, idx + 1].add(pwb * jnp.eye(6))
        H_pp = H_pp.at[idx + 1, idx].add(-pwb * Ad)
        H_pp = H_pp.at[idx, idx + 1].add(-pwb * jnp.swapaxes(Ad, -1, -2))
        b_p = b_p.at[idx + 1].add(-pw[:, None] * r_prior)
        b_p = b_p.at[idx].add(pw[:, None] * AdTr)
        return H_pp, A, H_dd, b_p, b_d

    def solve(H_pp, A, H_dd, b_p, b_d, lam):
        H_pp = H_pp + lam * jnp.eye(6)[None, None] * jnp.eye(F)[
            :, :, None, None
        ]
        H_dd_d = H_dd + lam + depth_damping + 1e-10
        Af = A.reshape(P, F * 6)
        Ainv = Af / H_dd_d[:, None]
        H_full = H_pp.transpose(0, 2, 1, 3).reshape(F * 6, F * 6)
        H_sc = H_full - Af.T @ Ainv
        b_sc = b_p.reshape(F * 6) - Ainv.T @ b_d
        # Gauge: frame 0 fixed (reference slam/optimizer.py:134).
        H_red = H_sc[6:, 6:]
        b_red = b_sc[6:]
        Lc = jnp.linalg.cholesky(H_red + 1e-8 * jnp.eye(H_red.shape[0]))
        dx_red = jax.scipy.linalg.cho_solve((Lc, True), b_red)
        dx_pose = jnp.concatenate([jnp.zeros(6), dx_red])
        dz = (b_d - Af @ dx_pose) / H_dd_d
        return dx_pose.reshape(F, 6), dz

    def lm_step(carry, _):
        poses, depths, lam, r, w, chi2_photo, chi2_prior, geom = carry
        chi2 = chi2_photo + chi2_prior
        Jd, Jh, Jz = edges_jacobian(geom, e_dir, K)
        r_pr, T_rel, _ = prior_eval(poses)
        H_pp, A, H_dd, b_p, b_d = build_system(r, w, Jd, Jh, Jz, r_pr, T_rel)
        dx_pose, dz = solve(H_pp, A, H_dd, b_p, b_d, lam)
        cand_poses = jax.vmap(lambda xi, T: se3_exp(xi) @ T)(dx_pose, poses)
        cand_depths = depths + dz

        r2, w2, chi2_new, geom2 = evaluate(cand_poses, cand_depths)
        _, _, prior_new = prior_eval(cand_poses)
        # Escape-proof acceptance (see ba.py:748-770): an edge that LEAVES
        # validity keeps its previous cost in the comparison.
        c_old = w * jnp.sum(r * r, axis=-1)
        c_new = w2 * jnp.sum(r2 * r2, axis=-1)
        escaped = geom.ok & ~geom2.ok
        chi2_cmp = jnp.sum(jnp.where(escaped, c_old, c_new)) + prior_new
        finite = (
            jnp.isfinite(chi2_cmp)
            & jnp.all(jnp.isfinite(cand_poses))
            & jnp.all(jnp.isfinite(cand_depths))
        )
        chi2_cmp = jnp.where(finite, chi2_cmp, jnp.inf)
        accept = chi2_cmp < chi2

        new_poses = jnp.where(accept, cand_poses, poses)
        new_depths = jnp.where(accept, cand_depths, depths)
        new_r = jnp.where(accept, r2, r)
        new_w = jnp.where(accept, w2, w)
        new_geom = jax.tree.map(
            lambda a, b: jnp.where(accept, a, b), geom2, geom
        )
        lam = jnp.where(accept, lam * 0.5, lam * 4.0)
        lam = jnp.clip(lam, 1e-8, 1e6)
        new_photo = jnp.where(accept, chi2_new, chi2_photo)
        new_prior = jnp.where(accept, prior_new, chi2_prior)
        return (
            new_poses, new_depths, lam, new_r, new_w, new_photo,
            new_prior, new_geom,
        ), chi2

    r0, w0, chi2_0, geom0 = evaluate(problem.poses, problem.depths)
    _, _, prior_0 = prior_eval(problem.poses)
    (poses, depths, lam, _, _, c_photo, c_prior, _), chi2_hist = jax.lax.scan(
        lm_step,
        (
            problem.poses, problem.depths, jnp.asarray(init_lambda),
            r0, w0, chi2_0, prior_0, geom0,
        ),
        None,
        length=num_iters,
    )
    return poses, depths, {
        "chi2": c_photo + c_prior, "chi2_photo": c_photo,
        "chi2_prior": c_prior, "chi2_history": chi2_hist, "lambda": lam,
    }


def photometric_ba_global_pyramid(
    problem: GlobalBAProblem,
    levels: Tuple[int, ...] = (2, 1),
    iters_per_level: Tuple[int, ...] = (7, 7),
    **kw,
):
    """Coarse-to-fine :func:`photometric_ba_global` (one dispatch per
    level), prior anchored at the ORIGINAL odometry chain across levels —
    the same invariant as ``ba.photometric_ba_pyramid``."""
    poses, depths = problem.poses, problem.depths
    anchor = kw.pop("prior_anchor", None)
    if anchor is None:
        anchor = problem.poses
    diag = None
    for s, it in zip(levels, iters_per_level):
        problem = problem._replace(poses=poses, depths=depths)
        poses, depths, diag = photometric_ba_global(
            problem, num_iters=int(it), scale=int(s),
            prior_anchor=anchor, **kw,
        )
    return poses, depths, diag
