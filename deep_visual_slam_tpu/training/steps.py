"""Jitted train/eval step factories (single-chip and mesh-sharded DP).

The reference's step is an eager torch loop + AMP GradScaler
(``vo/train.py:173-199``); here the whole step — both network forwards, the
4-scale warp/loss, backward, and the optimizer update — is one XLA program.
Under a mesh, the batch is sharded on the "data" axis and parameters are
replicated; GSPMD inserts the gradient all-reduce over ICI (the framework's
entire distributed-communication story, see ``parallel/mesh.py``).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from deep_visual_slam_tpu.training import vo_learner, depth_learner
from deep_visual_slam_tpu.training.state import TrainState
from deep_visual_slam_tpu.parallel.mesh import DATA_AXIS


# Image planes that may arrive as uint8 under the Train.uint8_h2d path
# (snippet triplet + the stereo pair's keys).
_IMAGE_KEYS = ("source_left", "target_image", "source_right", "source_image")


def _scale_uint8_images(batch):
    """uint8 image planes -> f32/255 ON DEVICE.

    The ``Train.uint8_h2d`` loader path ships batches as uint8 (4x fewer
    H2D bytes, no host astype); the scale runs here, at trace time gated
    on the STATIC dtype, and XLA fuses it into the first conv's input
    pipeline. fp32 batches pass through untouched, so every step factory
    accepts either layout with the same compiled program per dtype.
    """
    out = dict(batch)
    for k in _IMAGE_KEYS:
        v = out.get(k)
        if v is not None and v.dtype == jnp.uint8:
            out[k] = v.astype(jnp.float32) / 255.0
    return out


def _jit_step(step_fn, mesh: Optional[Mesh], donate_state: bool = True):
    """jit a (state, batch, rng) step, sharding the batch over the mesh."""
    if mesh is None:
        return jax.jit(step_fn, donate_argnums=(0,) if donate_state else ())
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        step_fn,
        in_shardings=(repl, data, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,) if donate_state else (),
    )


def make_vo_train_step(
    depth_model, pose_model, cfg: vo_learner.VOLossConfig,
    mesh: Optional[Mesh] = None, remat: bool = False,
    device_augment: bool = False, accum_steps: int = 1,
):
    """Returns ``train_step(state, batch, rng) -> (new_state, losses)``.

    ``remat=True`` rematerializes the DepthNet forward (``jax.checkpoint``):
    the backward pass recomputes the encoder/decoder activations instead of
    holding every multi-scale feature map of the 640x480 pyramid in HBM —
    the standard TPU trade of FLOPs for HBM at large batch (the reference's
    anchor bs16 regime). PoseNet and the warp/loss stay un-remat'ed (small
    relative footprint). Measured sweep: docs/remat_r03.json.

    ``device_augment=True`` applies the triplet ColorJitter ON DEVICE
    (``training/augment.py``) — pair with loaders built with
    ``augment=False`` so the weak host only reads+collates.

    ``accum_steps > 1``: gradient accumulation — the batch (leading dim B)
    is split into ``accum_steps`` microbatches of B/accum_steps, gradients
    are averaged over a ``lax.scan`` of per-microbatch backward passes, and
    ONE optimizer update is applied. This is how the reference's bs16
    anchor config (``vo/config.yaml:41-48``, one 30 GB GPU) runs on a chip
    where bs16 activations hit the HBM wall (measured: docs/remat_r03.json)
    — bs8 x 2 sees the identical averaged gradient a bs16 step would (the
    photometric loss is a per-sample mean), at half the peak activation
    memory. BatchNorm statistics are updated sequentially per microbatch
    (two EMA steps of momentum m instead of one over the joint batch —
    the standard accumulation approximation).
    """

    def grads_of(params, batch_stats, batch, rng):
        """One microbatch backward pass -> (grads, losses, new_stats)."""

        def loss_fn(p):
            mut = {}

            # Pure (params, stats, x) -> (out, updated_stats) so
            # jax.checkpoint can wrap it (the mutable-collection side
            # channel must flow through the return value, not a closure).
            def depth_fwd(dp, bs, x):
                return depth_model.apply(
                    {"params": dp, "batch_stats": bs},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                )

            if remat:
                depth_fwd = jax.checkpoint(depth_fwd)

            def depth_apply(_, x, train):
                out, upd = depth_fwd(p["depth"], batch_stats["depth"], x)
                mut["depth"] = upd["batch_stats"]
                return out

            def pose_apply(_, pairs, train):
                out, upd = pose_model.apply(
                    {"params": p["pose"], "batch_stats": batch_stats["pose"]},
                    pairs,
                    train=True,
                    mutable=["batch_stats"],
                )
                mut["pose"] = upd["batch_stats"]
                return out

            _, losses = vo_learner.process_batch(
                depth_apply, pose_apply, None, None, batch, cfg, rng,
                train=True,
            )
            return losses["loss"], (losses, mut)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        return grads, losses, new_stats

    def train_step(state: TrainState, batch, rng):
        batch = _scale_uint8_images(batch)
        if device_augment:
            from deep_visual_slam_tpu.training.augment import (
                batch_snippet_jitter,
            )

            rng, jrng = jax.random.split(rng)
            batch = batch_snippet_jitter(batch, jrng)

        if accum_steps <= 1:
            grads, losses, new_stats = grads_of(
                state.params, state.batch_stats, batch, rng
            )
        else:
            micro = jax.tree.map(
                lambda x: x.reshape(
                    accum_steps, x.shape[0] // accum_steps, *x.shape[1:]
                ),
                batch,
            )
            rngs = jax.random.split(rng, accum_steps)

            def body(carry, xs):
                stats, gacc = carry
                mb, r = xs
                g, losses, stats = grads_of(state.params, stats, mb, r)
                gacc = jax.tree.map(jnp.add, gacc, g)
                return (stats, gacc), losses

            (new_stats, gsum), losses_seq = jax.lax.scan(
                body,
                (state.batch_stats,
                 jax.tree.map(jnp.zeros_like, state.params)),
                (micro, rngs),
            )
            grads = jax.tree.map(lambda g: g / accum_steps, gsum)
            losses = jax.tree.map(lambda l: l.mean(0), losses_seq)

        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        losses["grad_norm"] = jnp.sqrt(
            sum(jnp.sum(g.astype(jnp.float32) ** 2) for g in jax.tree_util.tree_leaves(grads))
        )
        return new_state, losses

    return _jit_step(train_step, mesh)


def make_vo_eval_step(
    depth_model, pose_model, cfg: vo_learner.VOLossConfig, mesh: Optional[Mesh] = None
):
    """Returns ``eval_step(state, batch, rng) -> (outputs, losses)``.

    Runs with frozen BatchNorm statistics (inference mode). Returns the full
    outputs dict (disps, poses, warped images) for visualization/eval.
    """

    def eval_step(state: TrainState, batch, rng):
        batch = _scale_uint8_images(batch)

        def depth_apply(_, x, train):
            return depth_model.apply(
                {"params": state.params["depth"], "batch_stats": state.batch_stats["depth"]},
                x,
                train=False,
            )

        def pose_apply(_, pairs, train):
            return pose_model.apply(
                {"params": state.params["pose"], "batch_stats": state.batch_stats["pose"]},
                pairs,
                train=False,
            )

        outputs, losses = vo_learner.process_batch(
            depth_apply, pose_apply, None, None, batch, cfg, rng, train=False
        )
        keep = {
            "disp_0": outputs[("disp", 0)],
            "depth_0": outputs[("depth", 0)],
            "cam_T_cam_left": outputs[("cam_T_cam", 0, -1)],
            "cam_T_cam_right": outputs[("cam_T_cam", 0, 1)],
            "color_left_0": outputs[("color", -1, 0)],
            "color_right_0": outputs[("color", 1, 0)],
        }
        return keep, losses

    if mesh is None:
        return jax.jit(eval_step)
    repl = NamedSharding(mesh, P())
    data = NamedSharding(mesh, P(DATA_AXIS))
    return jax.jit(
        eval_step, in_shardings=(repl, data, repl), out_shardings=(data, repl)
    )


def _keep_old_pose(new_tree, old_tree):
    """Restore every leaf under a dict key named 'pose' from ``old_tree``.

    Zero gradients do NOT leave Adam inert: the first moment decays
    (mu <- b1*mu) and the parameter still moves by -lr*mhat/(sqrt(vhat)+eps)
    along stale momentum. A stereo step must be a pure depth update, so the
    pose subtrees of params and optimizer state are put back verbatim.
    """
    import jax.tree_util as jtu

    def pick(path, new, old):
        in_pose = any(
            isinstance(k, jtu.DictKey) and k.key == "pose" for k in path
        )
        return old if in_pose else new

    return jtu.tree_map_with_path(pick, new_tree, old_tree)


def make_stereo_train_step(
    depth_model, cfg: vo_learner.VOLossConfig, mesh: Optional[Mesh] = None
):
    """Stereo-pair train step: depth-only photometric loss at the known
    baseline pose (``vo_learner.process_stereo_batch``). Operates on the
    same joint (depth+pose) TrainState as the mono step; PoseNet params and
    Adam moments are restored after the update (``_keep_old_pose``) so the
    stereo stream trains the depth net only. The schedule/step count does
    advance — the trainer accounts stereo updates in ``total_steps``.
    """

    def train_step(state: TrainState, batch, rng):
        batch = _scale_uint8_images(batch)

        def loss_fn(params):
            mut = {}

            def depth_apply(_, x, train):
                out, upd = depth_model.apply(
                    {"params": params["depth"], "batch_stats": state.batch_stats["depth"]},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                )
                mut["depth"] = upd["batch_stats"]
                return out

            _, losses = vo_learner.process_stereo_batch(
                depth_apply, None, batch, cfg, rng, train=True
            )
            return losses["loss"], (losses, mut)

        (_, (losses, new_depth_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_stats = dict(state.batch_stats)
        new_stats["depth"] = new_depth_stats["depth"]
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        new_state = new_state.replace(
            params=_keep_old_pose(new_state.params, state.params),
            opt_state=_keep_old_pose(new_state.opt_state, state.opt_state),
        )
        return new_state, losses

    return _jit_step(train_step, mesh)


def make_depth_train_step(
    depth_model, cfg: depth_learner.DepthLossConfig, mesh: Optional[Mesh] = None
):
    """Supervised-depth train step (reference ``depth/train.py:129-155``)."""

    def train_step(state: TrainState, batch, rng):
        def loss_fn(params):
            mut = {}

            def depth_apply(_, x, train):
                out, upd = depth_model.apply(
                    {"params": params["depth"], "batch_stats": state.batch_stats["depth"]},
                    x,
                    train=True,
                    mutable=["batch_stats"],
                )
                mut["depth"] = upd["batch_stats"]
                return out

            total, losses, _ = depth_learner.forward_step(
                depth_apply, None, batch, cfg, train=True
            )
            return total, (losses, mut)

        (_, (losses, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        new_state = state.apply_gradients(grads).replace(batch_stats=new_stats)
        return new_state, losses

    return _jit_step(train_step, mesh)


def make_depth_eval_step(depth_model, cfg: depth_learner.DepthLossConfig):
    def eval_step(state: TrainState, batch, rng):
        def depth_apply(_, x, train):
            return depth_model.apply(
                {"params": state.params["depth"], "batch_stats": state.batch_stats["depth"]},
                x,
                train=False,
            )

        total, losses, preds = depth_learner.forward_step(
            depth_apply, None, batch, cfg, train=False
        )
        return losses, preds[0]

    return jax.jit(eval_step)
