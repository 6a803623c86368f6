"""Monodepth2-style depth network (Flax, NHWC).

Parity target: reference ``model/depthnet.py:22-90`` — ResNet encoder +
5-stage upconv decoder with skip connections, reflect-padded 3x3 convs + ELU
(``model/layers.py:105-135``), nearest x2 upsampling, sigmoid disparity heads
at 4 scales. Output dict keys mirror the reference: ``("disp", s)`` with
shape [B, H/2^s, W/2^s, 1].

Decoder channels [16, 32, 64, 128, 256] (reference ``model/depthnet.py:40``).

TPU optimization — the phase-fused final stage (exact, default on):
B=1 full-resolution convolutions with 16 channels run at ~2.8 TFLOP/s on
the MXU (lane-padding + tiny contractions), so the 640x480 stage dominates
inference. The final stage is therefore computed in the 2x2 space-to-depth
("phase") domain at half resolution with 4x the channels, where the same
chip measures ~4x higher conv throughput:

  conv3x3_reflect(nearest2x(a))  ==  depth_to_space(conv3x3_edgepad(a, K))

with K a fixed rearrangement of the logical 3x3 kernel (each output phase
(py, px) reads full-res taps whose row 2y+py+dy lands in half-res cell
floor((py+dy)/2) and phase (py+dy) mod 2 — a-inputs are phase-invariant so
their taps accumulate). The boundary identity that makes this exact: 1-px
REFLECT padding at full resolution equals EDGE padding of the half-res
tensor, because reflecting across one pixel lands in the adjacent phase of
the same edge cell (for nearest-upsampled content it lands on the edge cell
itself). Parameters keep the standard module paths, so checkpoints and the
torch converter are unaffected; ``phase_fused=False`` selects the reference
formulation bit-for-bit (tests assert both paths agree).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from deep_visual_slam_tpu.models.resnet import ResNetEncoder
from deep_visual_slam_tpu.ops.warp import (
    depth_to_space2,
    space_to_depth2,
    upsample_nearest_2x,
)

DEC_CHANNELS = (16, 32, 64, 128, 256)


def _phase_kernel(W: jnp.ndarray, a_channels: int, s_channels: int) -> jnp.ndarray:
    """Logical reflect-conv kernel [3, 3, Ca+S, F] -> phase-domain kernel
    [3, 3, Ca + 4S, 4F].

    Input channels: first ``a_channels`` are the pre-upsample (half-res,
    phase-invariant) tensor; the next ``4*s_channels`` are the
    space-to-depth blocks of a full-res skip tensor. Output channel
    ``(py*2+px)*F + f`` is full-res phase (py, px).
    """
    F = W.shape[-1]
    Ca, S = a_channels, s_channels
    K = jnp.zeros((3, 3, Ca + 4 * S, 4 * F), W.dtype)
    for py in range(2):
        for px in range(2):
            out_blk = (py * 2 + px) * F
            for dy in range(-1, 2):
                u = (py + dy) // 2  # floor division: -1 // 2 == -1
                pry = (py + dy) % 2
                for dx in range(-1, 2):
                    v = (px + dx) // 2
                    prx = (px + dx) % 2
                    w_tap = W[dy + 1, dx + 1]  # [Ca+S, F]
                    if Ca:
                        K = K.at[u + 1, v + 1, :Ca, out_blk:out_blk + F].add(
                            w_tap[:Ca]
                        )
                    if S:
                        in_blk = Ca + (pry * 2 + prx) * S
                        K = K.at[
                            u + 1, v + 1, in_blk:in_blk + S,
                            out_blk:out_blk + F,
                        ].set(w_tap[Ca:])
    return K


def _edge_pad_hw(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="edge")


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


class _RawConvParams(nn.Module):
    """kernel/bias with nn.Conv's exact names, shapes and initializers —
    declared without running the conv, so the phase-fused path shares the
    standard path's parameter tree (checkpoints/converters unchanged)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (3, 3, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class _Conv3x3Params(nn.Module):
    """Param shell matching ``ReflectConv3x3`` (child ``Conv_0``)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _RawConvParams(self.features, self.in_features, name="Conv_0")()


class _ConvBlockParams(nn.Module):
    """Param shell matching ``ConvBlock`` (child ``ReflectConv3x3_0``)."""

    features: int
    in_features: int

    @nn.compact
    def __call__(self):
        return _Conv3x3Params(
            self.features, self.in_features, name="ReflectConv3x3_0"
        )()


def _phase_conv(x: jnp.ndarray, K: jnp.ndarray, dtype) -> jnp.ndarray:
    """VALID 3x3 conv over an edge-padded phase-domain tensor."""
    import jax

    return jax.lax.conv_general_dilated(
        _edge_pad_hw(x).astype(dtype),
        K.astype(dtype),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class DepthDecoder(nn.Module):
    """Skip-connected upconv decoder over 5 encoder feature maps.

    ``phase_fused`` computes the final (full-resolution, 16-channel) stage
    in the space-to-depth domain — numerically equivalent, ~3x faster on
    TPU at B=1 (module docstring). The i==0 stage has no skip connection,
    so the fusion needs only the phase-invariant input path.
    """

    scales: Tuple[int, ...] = (0, 1, 2, 3)
    num_output_channels: int = 1
    use_skips: bool = True
    dtype: Any = jnp.float32
    phase_fused: bool = True

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray]
    ) -> Dict[Tuple[str, int], jnp.ndarray]:
        outputs: Dict[Tuple[str, int], jnp.ndarray] = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(DEC_CHANNELS[i], self.dtype, name=f"upconv_{i}_0")(x)
            if self.phase_fused and i == 0:
                F = DEC_CHANNELS[0]
                kern, bias = _ConvBlockParams(
                    F, x.shape[-1], name="upconv_0_1"
                )()
                K = _phase_kernel(kern, a_channels=x.shape[-1], s_channels=0)
                y = _phase_conv(x, K, self.dtype) + jnp.tile(
                    bias, 4
                ).astype(self.dtype)
                y = nn.elu(y)  # phase-domain [B, h, w, 4F]
                if 0 in self.scales:
                    kd, bd = _Conv3x3Params(
                        self.num_output_channels, F, name="dispconv_0"
                    )()
                    Kd = _phase_kernel(kd, a_channels=0, s_channels=F)
                    d = _phase_conv(y, Kd, self.dtype) + jnp.tile(
                        bd, 4
                    ).astype(self.dtype)
                    disp = depth_to_space2(d).astype(jnp.float32)
                    outputs[("disp", 0)] = nn.sigmoid(disp)
                return outputs
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
    phase_fused: bool = True

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
            phase_fused=self.phase_fused,
            name="decoder",
        )(features)
