"""Flow-based pose networks (experimental family in the reference).

Parity target: reference ``model/posenet_single.py``:
  - ``FlowPoseNet`` (``:91-147``): frozen SmallRAFT flow -> small CNN ->
    global pool -> FC -> 6-DoF scaled by 0.01,
  - ``ConvGRU`` with global-context gates (``:21-48``) and
    ``FlowUpdateModule`` (``:50-89``): correlation+flow encoders -> GRU ->
    pose head.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.models.raft import RAFT, _conv


class GlobalContextConvGRU(nn.Module):
    """ConvGRU whose gates get a squeeze-style global context term
    (reference ``model/posenet_single.py:21-48``)."""

    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp):
        hp = self.hidden_dim
        net_inp = jnp.concatenate([net, inp], axis=-1)

        w = nn.sigmoid(_conv(hp, 1, dtype=self.dtype, name="w")(net))
        glo = jnp.mean(w * net, axis=(1, 2), keepdims=True)  # [B,1,1,C]

        z = nn.sigmoid(
            _conv(hp, 3, dtype=self.dtype, name="convz")(net_inp)
            + _conv(hp, 1, dtype=self.dtype, name="convz_glo")(glo)
        )
        r = nn.sigmoid(
            _conv(hp, 3, dtype=self.dtype, name="convr")(net_inp)
            + _conv(hp, 1, dtype=self.dtype, name="convr_glo")(glo)
        )
        q = nn.tanh(
            _conv(hp, 3, dtype=self.dtype, name="convq")(
                jnp.concatenate([r * net, inp], axis=-1)
            )
            + _conv(hp, 1, dtype=self.dtype, name="convq_glo")(glo)
        )
        return (1 - z) * net + z * q


class FlowUpdateModule(nn.Module):
    """Correlation + flow -> GRU -> 6-DoF twist
    (reference ``model/posenet_single.py:50-89``)."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        cor = nn.relu(_conv(128, 1, dtype=self.dtype)(corr))
        cor = nn.relu(_conv(128, 3, dtype=self.dtype)(cor))
        flo = nn.relu(_conv(64, 7, dtype=self.dtype)(flow))
        flo = nn.relu(_conv(64, 3, dtype=self.dtype)(flo))
        x = jnp.concatenate([inp, cor, flo], axis=-1)
        net = GlobalContextConvGRU(128, self.dtype)(net, x)
        h = nn.relu(_conv(64, 3, dtype=self.dtype)(net))
        h = jnp.mean(h, axis=(1, 2))  # global average pool
        pose6 = nn.Dense(6, dtype=self.dtype, param_dtype=jnp.float32)(h)
        return net, pose6.astype(jnp.float32)


class FlowPoseNet(nn.Module):
    """RAFT flow -> CNN -> FC -> (axis-angle, translation) x 0.01.

    ``__call__(pair[B,H,W,6])`` like the reference forward (``:128-147``).
    The internal RAFT is run in inference mode (frozen weights come from the
    checkpoint loader; gradients are stopped like the reference's frozen
    flow_net).
    """

    iters: int = 12
    pose_scale: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pair, train: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        left = pair[..., :3]
        right = pair[..., 3:]
        flow_net = RAFT(small=True, iters=self.iters, dtype=self.dtype, name="flow_net")
        flow = flow_net(left, right, train=False)[-1]  # [B, H, W, 2]
        flow = jax.lax.stop_gradient(flow)

        x = nn.relu(_conv(32, 7, 2, dtype=self.dtype)(flow))
        x = nn.relu(_conv(64, 5, 2, dtype=self.dtype)(x))
        x = nn.relu(_conv(128, 3, 2, dtype=self.dtype)(x))
        feat = jnp.mean(x, axis=(1, 2))  # [B, 128]
        pose6 = nn.Dense(6, dtype=self.dtype, param_dtype=jnp.float32)(feat)
        pose6 = self.pose_scale * pose6.reshape(-1, 1, 1, 6).astype(jnp.float32)
        return pose6[..., :3], pose6[..., 3:]

