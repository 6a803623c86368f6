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


def _strided_phase_kernel(W: jnp.ndarray) -> jnp.ndarray:
    """Logical reflect-conv kernel [3, 3, C, F] -> output-phase-packed
    stride-2 kernel [4, 4, C, 4F].

    Packs the 2x2 output phases of a conv over a GENUINE (not
    nearest-upsampled) logical-resolution tensor into channels: output cell
    y, phase py reads logical rows 2y+py+dy, dy in {-1,0,1} — a 4-row window
    anchored at 2y-1, so position py+dy+1 of a 4x4 stride-2 kernel. 9/16
    density: 1.78x the logical FLOPs for 4x the output-lane utilization
    (vs 4x FLOPs for space-to-depth'ing the input). Boundary: reflect-pad
    the logical tensor by 1 on each side (rows -1..L), exactly the logical
    conv's reflect padding.
    """
    F = W.shape[-1]
    C = W.shape[2]
    K = jnp.zeros((4, 4, C, 4 * F), W.dtype)
    for py in range(2):
        for px in range(2):
            blk = (py * 2 + px) * F
            for dy in range(-1, 2):
                for dx in range(-1, 2):
                    K = K.at[py + dy + 1, px + dx + 1, :, blk:blk + F].set(
                        W[dy + 1, dx + 1]
                    )
    return K


def _strided_phase_conv(x: jnp.ndarray, K4: jnp.ndarray, dtype) -> jnp.ndarray:
    """[B, L, M, C] logical tensor -> [B, L/2, M/2, 4F] phase-packed output
    of the logical reflect conv (kernel from :func:`_strided_phase_kernel`)."""
    import jax

    x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x.astype(dtype),
        K4.astype(dtype),
        window_strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


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
    predict_uncertainty: bool = False

    @nn.compact
    def __call__(
        self, features: Sequence[jnp.ndarray]
    ) -> Dict[Tuple[str, int], jnp.ndarray]:
        outputs: Dict[Tuple[str, int], jnp.ndarray] = {}
        x = features[-1]
        for i in range(4, -1, -1):
            x = ConvBlock(DEC_CHANNELS[i], self.dtype, name=f"upconv_{i}_0")(x)
            if self.phase_fused and i == 1 and self.use_skips:
                return self._fused_tail(x, features[0], outputs)
            x = upsample_nearest_2x(x)
            if self.use_skips and i > 0:
                x = jnp.concatenate([x, features[i - 1]], axis=-1)
            x = ConvBlock(DEC_CHANNELS[i], self.dtype, name=f"upconv_{i}_1")(x)
            if self.phase_fused and i == 1:  # no-skip variant: fuse stage 0
                if 1 in self.scales:
                    disp = ReflectConv3x3(
                        self.num_output_channels, self.dtype, name="dispconv_1"
                    )(x)
                    outputs[("disp", 1)] = nn.sigmoid(disp.astype(jnp.float32))
                x = ConvBlock(DEC_CHANNELS[0], self.dtype, name="upconv_0_0")(x)
                return self._fused_stage0(x, outputs)
            if i in self.scales:
                disp = ReflectConv3x3(
                    self.num_output_channels, self.dtype, name=f"dispconv_{i}"
                )(x)
                outputs[("disp", i)] = nn.sigmoid(disp.astype(jnp.float32))
            if i == 0 and self.predict_uncertainty:
                # D3VO-style photometric-uncertainty head (the reference
                # STORES per-frame uncertainty but its runnable path feeds
                # zeros, slam/MonoVO.py:19-27 / slam/optimizer.py:126,179).
                # Sigmoid sigma in [0, 1] intensity units, full resolution.
                unc = ReflectConv3x3(
                    self.num_output_channels, self.dtype, name="uncconv_0"
                )(x)
                outputs[("unc", 0)] = nn.sigmoid(unc.astype(jnp.float32))
        return outputs

    def _phase_disp(self, y: jnp.ndarray, F: int, name: str) -> jnp.ndarray:
        """sigmoid dispconv over a phase-domain tensor y=[B,h,w,4F], returned
        at logical resolution [B, 2h, 2w, 1].

        Computed phase-major as a 9-tap sum of [P,C]x[C,(h,w)] contractions
        rather than a conv: with only 4*num_output_channels output channels a
        feature-minor conv uses 4/128 output lanes (profiled 120 us/frame at
        640x480 for dispconv_0 alone); putting W in the lane dimension runs
        the same math at full lane width (~16x), and the phase-major result
        maps to the full-res raster by a cheap small transpose.
        """
        import jax

        kd, bd = _Conv3x3Params(self.num_output_channels, F, name=name)()
        Kd = _phase_kernel(kd, a_channels=0, s_channels=F)  # [3,3,4F,4C]
        yp = _edge_pad_hw(y).astype(self.dtype)
        B, h, w = y.shape[0], y.shape[1], y.shape[2]
        d = None
        for dy in range(3):
            for dx in range(3):
                tap = jnp.einsum(
                    "cp,bhwc->bphw",
                    Kd[dy, dx].astype(self.dtype),
                    jax.lax.slice(
                        yp, (0, dy, dx, 0), (B, dy + h, dx + w, yp.shape[3])
                    ),
                    preferred_element_type=jnp.float32,
                )
                d = tap if d is None else d + tap
        # [B, (py,px,c), h, w] -> [B, 2h, 2w, c], + per-channel bias
        d = d.reshape(B, 2, 2, self.num_output_channels, h, w)
        d = d + bd.reshape(1, 1, 1, -1, 1, 1).astype(jnp.float32)
        d = d.transpose(0, 4, 1, 5, 2, 3).reshape(
            B, 2 * h, 2 * w, self.num_output_channels
        )
        return nn.sigmoid(d)

    def _fused_stage0(self, x: jnp.ndarray, outputs):
        """Final (full-resolution) stage in the 2x2 phase domain: x is the
        16-ch half-res output of upconv_0_0; the nearest-2x + reflect-conv
        runs as an a-type phase conv (same FLOPs, 4x the output lanes)."""
        F = DEC_CHANNELS[0]
        kern, bias = _ConvBlockParams(F, x.shape[-1], name="upconv_0_1")()
        K = _phase_kernel(kern, a_channels=x.shape[-1], s_channels=0)
        y = _phase_conv(x, K, self.dtype) + jnp.tile(bias, 4).astype(self.dtype)
        y = nn.elu(y)  # phase-domain [B, h, w, 4F]
        if 0 in self.scales:
            outputs[("disp", 0)] = self._phase_disp(y, F, "dispconv_0")
        if self.predict_uncertainty:
            # Same phase-major sigmoid-head machinery as dispconv_0 (the
            # head is an independent 3x3 conv over the same tensor).
            outputs[("unc", 0)] = self._phase_disp(y, F, "uncconv_0")
        return outputs

    def _fused_tail(self, x: jnp.ndarray, skip: jnp.ndarray, outputs):
        """Stages 1 and 0 entirely in phase domains (B=1 inference hot path).

        x: quarter-res 32-ch output of upconv_1_0 (pre-upsample);
        skip: half-res encoder feature (64 ch). The logical stage-1 conv
        splits by linearity: the nearest-upsampled part as an a-type phase
        conv (1x FLOPs), the skip part as an output-phase-packed stride-2
        4x4 conv (1.78x FLOPs, 4x lanes) — cheaper than space-to-depth'ing
        the skip (4x FLOPs). upconv_0_0 (half-res logical) also runs
        output-phase-packed; the final stage reuses ``_fused_stage0``.
        """
        F1 = DEC_CHANNELS[1]
        a_ch = x.shape[-1]
        kern, bias = _ConvBlockParams(
            F1, a_ch + skip.shape[-1], name="upconv_1_1"
        )()
        Ka = _phase_kernel(kern[:, :, :a_ch], a_channels=a_ch, s_channels=0)
        Ks = _strided_phase_kernel(kern[:, :, a_ch:])
        y = (
            _phase_conv(x, Ka, self.dtype)
            + _strided_phase_conv(skip, Ks, self.dtype)
            + jnp.tile(bias, 4).astype(self.dtype)
        )
        y = nn.elu(y)  # phase(x4): [B, H/4, W/4, 4*F1]
        if 1 in self.scales:
            outputs[("disp", 1)] = self._phase_disp(y, F1, "dispconv_1")
        # upconv_0_0: logical half-res reflect conv, output-phase-packed.
        F0 = DEC_CHANNELS[0]
        k0, b0 = _ConvBlockParams(F0, F1, name="upconv_0_0")()
        K0 = _strided_phase_kernel(k0)
        y0 = _strided_phase_conv(depth_to_space2(y), K0, self.dtype) + jnp.tile(
            b0, 4
        ).astype(self.dtype)
        x5 = depth_to_space2(nn.elu(y0))  # [B, H/2, W/2, F0]
        return self._fused_stage0(x5, outputs)


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
    predict_uncertainty: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False, stem_out=None):
        features = ResNetEncoder(
            num_layers=self.num_layers,
            num_input_images=1,
            dtype=self.dtype,
            bn_axis_name=self.bn_axis_name,
            name="encoder",
        )(x, train=train, stem_out=stem_out)
        return DepthDecoder(
            scales=self.scales,
            num_output_channels=self.num_output_channels,
            use_skips=self.use_skips,
            dtype=self.dtype,
            phase_fused=self.phase_fused,
            predict_uncertainty=self.predict_uncertainty,
            name="decoder",
        )(features)
