"""Monodepth2-style depth network (Flax, NHWC).

Parity target: reference ``model/depthnet.py:22-90`` — ResNet encoder +
5-stage upconv decoder with skip connections, reflect-padded 3x3 convs + ELU
(``model/layers.py:105-135``), nearest x2 upsampling, sigmoid disparity heads
at 4 scales. Output dict keys mirror the reference: ``("disp", s)`` with
shape [B, H/2^s, W/2^s, 1].

Decoder channels [16, 32, 64, 128, 256] (reference ``model/depthnet.py:40``).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deep_visual_slam_tpu.models.resnet import ResNetEncoder
from deep_visual_slam_tpu.ops.warp import upsample_nearest_2x

DEC_CHANNELS = (16, 32, 64, 128, 256)


class ReflectConv3x3(nn.Module):
    """Reflection-pad(1) + 3x3 conv — the reference's ``Conv3x3``
    (``model/layers.py:120-135``)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
        return nn.Conv(
            self.features,
            (3, 3),
            padding="VALID",
            dtype=self.dtype,
            param_dtype=jnp.float32,
        )(x)


class ConvBlock(nn.Module):
    """ReflectConv3x3 + ELU (reference ``model/layers.py:105-117``)."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.elu(ReflectConv3x3(self.features, self.dtype)(x))


class DepthDecoder(nn.Module):
    """Skip-connected upconv decoder over 5 encoder feature maps."""

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray]
    ) -> Dict[Tuple[str, int], jnp.ndarray]:
        outputs: Dict[Tuple[str, int], jnp.ndarray] = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(DEC_CHANNELS[i], self.dtype, name=f"upconv_{i}_0")(x)
            x = upsample_nearest_2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlock(DEC_CHANNELS[i], self.dtype, name=f"upconv_{i}_1")(x)
            if i in self.scales:
                disp = ReflectConv3x3(
                    self.num_output_channels, self.dtype, name=f"dispconv_{i}"
                )(x)
                outputs[("disp", i)] = nn.sigmoid(disp.astype(jnp.float32))
        return outputs


class DepthNet(nn.Module):
    """Encoder + decoder producing multi-scale sigmoid disparity.

    ``__call__(image[B,H,W,3], train)`` -> ``{("disp", s): [B,H/2^s,W/2^s,1]}``
    for s in ``scales`` (reference ``model/depthnet.py:64-90``).
    """

    num_layers: int = 18
    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32
    bn_axis_name: str | None = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        features = ResNetEncoder(
            num_layers=self.num_layers,
            num_input_images=1,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="encoder",
        )(x, train=train)
        return DepthDecoder(
            scales=self.scales,
            num_output_channels=self.num_output_channels,
            use_skips=self.use_skips,
            dtype=self.dtype,
            name="decoder",
        )(features)
