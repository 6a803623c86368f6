"""ResNet encoder family in Flax (NHWC, TPU-native).

Capability parity with the reference encoder (``model/resnet_encoder.py``):
  - depths 18/34/50/101/152, multi-image first conv (``num_input_images``),
  - input normalization ``(x - 0.45) / 0.225``
    (reference ``model/resnet_encoder.py:102``),
  - returns the 5 feature maps [H/2, H/4, H/8, H/16, H/32] consumed by the
    skip-connected depth decoder,
  - channel widths [64, 64, 128, 256, 512] (x4 past stage 1 for depth > 34).

TPU-first choices:
  - NHWC layout; convs hit the MXU via XLA's conv-to-GEMM tiling.
  - Explicit torch-style symmetric padding so feature maps match the
    reference's shapes exactly (SAME padding would pad asymmetrically).
  - BatchNorm supports a cross-replica ``axis_name`` for data-parallel
    training over a device mesh (the reference is single-GPU and has no
    equivalent).
  - ``dtype`` selects the compute precision (bf16 by default in trainers),
    while parameters stay fp32.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

ModuleDef = Any

STAGE_SIZES = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


def _conv(features: int, kernel: int, stride: int, dtype) -> nn.Conv:
    pad = (kernel - 1) // 2
    return nn.Conv(
        features,
        (kernel, kernel),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
        use_bias=False,
        dtype=dtype,
        param_dtype=jnp.float32,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
    )


class BasicBlock(nn.Module):
    """Two 3x3 convs + identity shortcut (ResNet-18/34)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv(self.features, 3, self.stride, self.dtype)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, 1, self.dtype)(y)
        y = self.norm()(y)
        if residual.shape != y.shape:
            residual = _conv(self.features, 1, self.stride, self.dtype)(x)
            residual = self.norm()(residual)
        return nn.relu(y + residual)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3(stride) -> 1x1(x4) bottleneck (ResNet-50/101/152, v1.5)."""

    features: int
    stride: int = 1
    dtype: Any = jnp.float32
    norm: ModuleDef = nn.BatchNorm

    @nn.compact
    def __call__(self, x):
        residual = x
        y = _conv(self.features, 1, 1, self.dtype)(x)
        y = self.norm()(y)
        y = nn.relu(y)
        y = _conv(self.features, 3, self.stride, self.dtype)(y)
        y = self.norm()(y)
        y = nn.relu(y)
        y = _conv(self.features * 4, 1, 1, self.dtype)(y)
        y = self.norm()(y)
        if residual.shape != y.shape:
            residual = _conv(self.features * 4, 1, self.stride, self.dtype)(x)
            residual = self.norm()(residual)
        return nn.relu(y + residual)


def _max_pool_3x3_s2(x):
    """torch ``MaxPool2d(3, stride=2, padding=1)`` equivalent (NHWC)."""
    return nn.max_pool(
        x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1))
    )


class _StemParams(nn.Module):
    """The stem conv's kernel with nn.Conv's exact name/shape/init, declared
    without running the conv (the s2d stem consumes it rearranged)."""

    in_features: int

    @nn.compact
    def __call__(self):
        return self.param(
            "kernel",
            nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
            (7, 7, self.in_features, 64),
        )


def _s2d_stem_kernel(W: jnp.ndarray) -> jnp.ndarray:
    """Logical stem kernel [7, 7, Cin, 64] -> phase-domain [4, 4, 4Cin, 64].

    The stride-2 7x7 zero-padded stem is exactly a stride-1 4x4 conv over
    the 2x2 space-to-depth input: full-res tap row 2y+dy-3 lands in half-res
    cell y + floor((dy-3)/2), phase (dy-3) mod 2 (zero padding is trivially
    preserved). B=1 full-res 3/6-channel convs run at ~1% MXU efficiency;
    the s2d form measures ~2x faster on-chip.
    """
    Cin = W.shape[2]
    K = jnp.zeros((4, 4, 4 * Cin, 64), W.dtype)
    for dy in range(7):
        u = (dy - 3) // 2 + 2
        pry = (dy - 3) % 2
        for dx in range(7):
            v = (dx - 3) // 2 + 2
            prx = (dx - 3) % 2
            blk = (pry * 2 + prx) * Cin
            K = K.at[u, v, blk:blk + Cin, :].set(W[dy, dx])
    return K


class ResNetEncoder(nn.Module):
    """Multi-scale ResNet feature encoder.

    Args:
      num_layers: one of 18/34/50/101/152.
      num_input_images: stacked RGB frames (PoseNet uses 2 -> 6 channels).
      dtype: compute dtype (bf16 recommended on TPU).
      bn_momentum/bn_epsilon: BatchNorm running-stat params (torch defaults).
      bn_axis_name: optional mesh axis for cross-replica batch statistics
        under data parallelism.

    Call returns a list of 5 NHWC feature maps with channel counts
    ``num_ch_enc`` (reference ``model/resnet_encoder.py:81``).
    """

    num_layers: int = 18
    num_input_images: int = 1
    dtype: Any = jnp.float32
    bn_momentum: float = 0.9
    bn_epsilon: float = 1e-5
    bn_axis_name: str | None = None
    # Compute the stride-2 7x7 stem as a stride-1 4x4 conv in the 2x2
    # space-to-depth domain (exact; see _s2d_stem_kernel). Same parameters.
    # Default OFF: the fused stem wins in isolation (0.24 vs 0.48 ms at
    # 640x480 B=1) but REGRESSES the full VO pipeline (306 -> 247 FPS) —
    # the s2d layout propagates into the rest of the program and forces
    # relayouts. Kept as a measured, tested option.
    # (A third variant was measured and rejected: im2col — 49 strided-slice
    # taps concatenated into a [B,H/2,W/2,49C] patch tensor + one GEMM —
    # benches 5.2 vs 1.12 ms/frame for the whole encoder at 640x480 B=1;
    # stride-2 slices across the lane dimension relayout per tap.)
    s2d_stem: bool = False

    @property
    def num_ch_enc(self) -> Tuple[int, ...]:
        base = (64, 64, 128, 256, 512)
        if self.num_layers > 34:
            return (64,) + tuple(c * 4 for c in base[1:])
        return base

    @nn.compact
    def __call__(
        self, x, train: bool = False, stem_out=None
    ) -> Sequence[jnp.ndarray]:
        """``stem_out`` optionally injects a precomputed pre-BN stem conv
        output [B, H/2, W/2, 64] (see ``models/fused_vo.py``: the VO
        inference path merges the depth and pose stems into one conv over
        the shared 6-channel pair); normalization and the stem conv are then
        skipped, everything from the stem BN onward runs normally."""
        if self.num_layers not in STAGE_SIZES:
            raise ValueError(f"{self.num_layers} is not a valid resnet depth")
        block = BasicBlock if self.num_layers <= 34 else BottleneckBlock
        stages = STAGE_SIZES[self.num_layers]

        def norm():
            return nn.BatchNorm(
                use_running_average=not train,
                momentum=self.bn_momentum,
                epsilon=self.bn_epsilon,
                dtype=self.dtype,
                param_dtype=jnp.float32,
                axis_name=self.bn_axis_name if train else None,
            )

        features = []
        if stem_out is not None:
            # stem_out carries the pre-BN stem conv output of the already-
            # normalized input (models/fused_vo.py); the image is unused.
            x = stem_out.astype(self.dtype)
        elif self.s2d_stem:
            import jax
            from deep_visual_slam_tpu.ops.warp import space_to_depth2

            x = (x.astype(self.dtype) - 0.45) / 0.225
            W = _StemParams(x.shape[-1], name="Conv_0")()
            K = _s2d_stem_kernel(W)
            x = jax.lax.conv_general_dilated(
                space_to_depth2(x).astype(self.dtype),
                K.astype(self.dtype),
                window_strides=(1, 1),
                padding=((2, 1), (2, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        else:
            x = (x.astype(self.dtype) - 0.45) / 0.225
            x = _conv(64, 7, 2, self.dtype)(x)
        x = norm()(x)
        x = nn.relu(x)
        features.append(x)  # H/2, 64

        x = _max_pool_3x3_s2(x)
        widths = (64, 128, 256, 512)
        for stage, (width, n_blocks) in enumerate(zip(widths, stages)):
            for i in range(n_blocks):
                stride = 2 if (stage > 0 and i == 0) else 1
                x = block(
                    features=width, stride=stride, dtype=self.dtype, norm=norm
                )(x)
            features.append(x)  # H/4, H/8, H/16, H/32

        return features
