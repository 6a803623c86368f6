"""PoseNet: 6-DoF relative camera motion from a concatenated image pair.

Parity target: reference ``model/posenet_single.py:149-202`` —
ResNet-18 encoder over the 6-channel pair, 1x1 squeeze(512->256) + ReLU,
three 3x3 convs (ReLU after the first two), global spatial mean, 0.01
output scaling, split into axis-angle [B, 1, 1, 3] + translation [B, 1, 1, 3].
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deep_visual_slam_tpu.models.resnet import ResNetEncoder


class PoseNet(nn.Module):
    """Axis-angle + translation regressor over stacked frames.

    ``__call__(pair[B,H,W,3*num_input_images], train)`` ->
    ``(axisangle[B,1,1,3], translation[B,1,1,3])``, both pre-scaled by 0.01
    (reference ``model/posenet_single.py:195-202``).
    """

    num_layers: int = 18
    num_input_images: int = 2
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(
        self, x, train: bool = False, stem_out=None
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        features = ResNetEncoder(
            num_layers=self.num_layers,
            num_input_images=self.num_input_images,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="encoder",
        )(x, train=train, stem_out=stem_out)
        out = features[-1]

        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f,
            (k, k),
            padding=((k // 2, k // 2),) * 2,
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name=name,
        )
        out = nn.relu(conv(256, 1, "squeeze")(out))
        out = nn.relu(conv(256, 3, "pose_0")(out))
        out = nn.relu(conv(256, 3, "pose_1")(out))
        out = conv(6, 1, "pose_2")(out)

        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))  # [B, 6]
        out = 0.01 * out.reshape(-1, 1, 1, 6)
        return out[..., :3], out[..., 3:]


class TwoEncoderPoseNet(nn.Module):
    """Legacy variant: one ResNet encoder per image, squeezed features
    concatenated, predicting 6*(num_input_images-1) params
    (reference ``model/posenet.py:19-96``)."""

    num_layers: int = 18
    num_input_images: int = 2
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        B = x.shape[0]
        n = self.num_input_images
        images = jnp.split(x, n, axis=-1)
        # One shared-weight encoder applied per frame (stacked on batch).
        feats = ResNetEncoder(
            num_layers=self.num_layers,
            num_input_images=1,
            dtype=self.dtype,
            name="encoder",
        )(jnp.concatenate(images, axis=0), train=train)[-1]

        conv = lambda f, k, name: nn.Conv(  # noqa: E731
            f, (k, k), padding=((k // 2, k // 2),) * 2,
            dtype=self.dtype, param_dtype=jnp.float32, name=name,
        )
        squeezed = nn.relu(conv(256, 1, "squeeze")(feats))
        parts = jnp.split(squeezed, n, axis=0)
        out = jnp.concatenate(parts, axis=-1)
        out = nn.relu(conv(256, 3, "pose_0")(out))
        out = nn.relu(conv(256, 3, "pose_1")(out))
        out = conv(6 * (n - 1), 1, "pose_2")(out)
        out = jnp.mean(out.astype(jnp.float32), axis=(1, 2))
        out = 0.01 * out.reshape(B, n - 1, 1, 6)
        return out[..., :3], out[..., 3:]
