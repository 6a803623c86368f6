"""Train state + optimizer factory.

Parity targets:
  - VO: Adam at ``init_lr`` + per-epoch PolynomialLR(power=0.9)
    (reference ``vo/train.py:114-124``).
  - Depth: Adam with (beta1, 0.999) betas and weight decay
    (reference ``depth/train.py:66-80``).

TPU-native notes: loss scaling (the reference's AMP GradScaler,
``vo/train.py:127-128``) is unnecessary in bf16, so there is no scaler here;
the schedule is evaluated per-step (smooth) rather than per-epoch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct
from flax.core import FrozenDict


class TrainState(struct.PyTreeNode):
    """Carries params + BatchNorm running stats + optimizer state.

    ``params`` / ``batch_stats`` are dicts keyed by model name
    (e.g. {"depth": ..., "pose": ...}) so one optimizer spans both networks,
    exactly like the reference's single Adam over depth+pose parameters
    (``vo/train.py:114-117``).
    """

    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: optax.OptState
    tx: optax.GradientTransformation = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(
            grads, self.opt_state, self.params
        )
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
        )

    @classmethod
    def create(cls, params, batch_stats, tx) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            tx=tx,
        )


def polynomial_lr(
    init_lr: float,
    total_steps: int,
    power: float = 0.9,
    end_lr: float = 0.0,
) -> optax.Schedule:
    """``lr = (init - end) * (1 - t/T)^power + end``.

    torch ``PolynomialLR(total_iters=T, power=0.9)`` decays to zero at T
    (reference ``vo/train.py:120-124``); evaluated per-step here for a smooth
    decay instead of per-epoch staircase.
    """
    return optax.polynomial_schedule(
        init_value=init_lr,
        end_value=end_lr,
        power=power,
        transition_steps=total_steps,
    )


def make_optimizer(
    init_lr: float,
    total_steps: int,
    beta1: float = 0.9,
    weight_decay: float = 0.0,
    power: float = 0.9,
    end_lr: float = 0.0,
    max_grad_norm: Optional[float] = None,
) -> optax.GradientTransformation:
    """Adam(W) + polynomial decay, optionally gradient-clipped."""
    schedule = polynomial_lr(init_lr, total_steps, power, end_lr)
    if weight_decay > 0:
        opt = optax.adamw(schedule, b1=beta1, b2=0.999, weight_decay=weight_decay)
    else:
        opt = optax.adam(schedule, b1=beta1, b2=0.999)
    if max_grad_norm is not None:
        opt = optax.chain(optax.clip_by_global_norm(max_grad_norm), opt)
    return opt


def init_vo_models(
    depth_model, pose_model, image_shape, rng: jax.Array
) -> Dict[str, Dict]:
    """Initialize depth+pose variables for the given [H, W] input size."""
    H, W = image_shape
    k1, k2 = jax.random.split(rng)
    # jit the init: un-jitted flax init dispatches every op eagerly, which is
    # pathologically slow over a remote-TPU tunnel (~100 ms/op RPC).
    dvars = jax.jit(depth_model.init)(k1, jnp.zeros((1, H, W, 3), jnp.float32))
    pvars = jax.jit(pose_model.init)(k2, jnp.zeros((1, H, W, 6), jnp.float32))
    params = {"depth": dvars["params"], "pose": pvars["params"]}
    stats = {
        "depth": dvars.get("batch_stats", FrozenDict()),
        "pose": pvars.get("batch_stats", FrozenDict()),
    }
    return {"params": params, "batch_stats": stats}
