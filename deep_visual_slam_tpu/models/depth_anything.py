"""Depth-Anything-V2: DINOv2 ViT backbone + DPT metric-depth head (Flax).

Parity target: reference ``model/depth_anything_v2/`` (inference-only aux
model, SURVEY.md §2.1):
  - DINOv2 ViT (s/b/l/g): 14x14 patch embed, cls token, interpolated position
    embeddings, pre-norm blocks with LayerScale (``dinov2.py``,
    ``dinov2_layers/``),
  - DPT head: four intermediate layers -> 1x1 projects -> resize stack
    (x4/x2/x1/÷2) -> 3x3 rn convs -> refinenet fusion cascade -> sigmoid
    metric head scaled by max_depth (``dpt.py:38-150``),
  - intermediate layer indices per variant (``dpt.py:164-169``).

TPU-native: NHWC; attention uses ``jax.nn.dot_product_attention`` (fused on
TPU); variable input sizes handled by torch-exact bicubic pos-embed
resampling (a=-0.75, +0.1 offset scale — ``ops.warp.resize_bicubic_torch``),
so converted checkpoints match the torch reference at EVERY input size.

Checkpoint compatibility: ``utils.torch_weights.convert_depth_anything``;
parity tests at the native 518 grid and off-grid sizes in
``tests/test_convert_da.py``.
"""

from __future__ import annotations

from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.ops.warp import (
    resize_bicubic_torch,
    resize_bilinear_align_corners,
)

VIT_CONFIGS = {
    "vits": dict(embed_dim=384, depth=12, num_heads=6,
                 layers=(2, 5, 8, 11), out_channels=(48, 96, 192, 384),
                 features=64),
    "vitb": dict(embed_dim=768, depth=12, num_heads=12,
                 layers=(2, 5, 8, 11), out_channels=(96, 192, 384, 768),
                 features=128),
    "vitl": dict(embed_dim=1024, depth=24, num_heads=16,
                 layers=(4, 11, 17, 23), out_channels=(256, 512, 1024, 1024),
                 features=256),
    "vitg": dict(embed_dim=1536, depth=40, num_heads=24,
                 layers=(9, 19, 29, 39), out_channels=(1536, 1536, 1536, 1536),
                 features=384),
}
PATCH = 14
IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Attention(nn.Module):
    dim: int
    num_heads: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):  # [B, N, D]
        B, N, D = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * D, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv.reshape(B, N, 3, h, D // h), 3, axis=2)
        q, k, v = (t.squeeze(2) for t in (q, k, v))  # [B, N, h, d]
        out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(B, N, D)
        return nn.Dense(D, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma


class Block(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        y = Attention(self.dim, self.num_heads, self.dtype, name="attn")(y)
        x = x + LayerScale(self.dim, name="ls1")(y)

        y = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        hidden = int(self.dim * self.mlp_ratio)
        y = nn.Dense(hidden, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc1")(y)
        # exact erf GELU (DINOv2 uses torch nn.GELU, not the tanh approx)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="mlp_fc2")(y)
        return x + LayerScale(self.dim, name="ls2")(y)


class DINOv2(nn.Module):
    """ViT returning (patch tokens, cls token) at selected depths."""

    embed_dim: int = 384
    depth: int = 12
    num_heads: int = 6
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, layer_idx: Sequence[int]):
        B, H, W, _ = x.shape
        ph, pw = H // PATCH, W // PATCH
        x = nn.Conv(
            self.embed_dim, (PATCH, PATCH), strides=(PATCH, PATCH),
            padding="VALID", dtype=self.dtype, param_dtype=jnp.float32,
            name="patch_embed",
        )(x)
        x = x.reshape(B, ph * pw, self.embed_dim)

        cls = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        )
        # Position embeddings are stored at a base grid and bilinearly
        # interpolated to the current patch grid (DINOv2 convention).
        base = 37  # 518 / 14
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, base * base + 1, self.embed_dim),
        )
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        if (ph, pw) != (base, base):
            grid = patch_pos.reshape(1, base, base, self.embed_dim)
            # Torch-exact DINOv2 resample: bicubic (a=-0.75), scale carries
            # the +0.1 anti-FP-error offset (dinov2.py:194-205). Exact at
            # EVERY input size, not just the native 518 grid.
            grid = resize_bicubic_torch(
                grid, ph, pw,
                scale_h=(ph + 0.1) / base, scale_w=(pw + 0.1) / base,
            )
            patch_pos = grid.reshape(1, ph * pw, self.embed_dim)
        x = x + patch_pos
        cls_tok = jnp.broadcast_to(cls + cls_pos, (B, 1, self.embed_dim))
        x = jnp.concatenate([cls_tok, x], axis=1)

        outputs = []
        want = set(layer_idx)
        for i in range(self.depth):
            x = Block(self.embed_dim, self.num_heads, dtype=self.dtype,
                      name=f"block_{i}")(x)
            if i in want:
                outputs.append((x[:, 1:], x[:, 0]))
        # Final norm applied to collected features (DINOv2 applies norm in
        # get_intermediate_layers with norm=True).
        norm = nn.LayerNorm(dtype=self.dtype, name="norm")
        return [(norm(t), norm(c)) for t, c in outputs], (ph, pw)


class ResidualConvUnit(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32)(y)
        return x + y


class FeatureFusionBlock(nn.Module):
    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, residual=None, size: Tuple[int, int] | None = None):
        if residual is not None:
            x = x + ResidualConvUnit(self.features, self.dtype)(residual)
        x = ResidualConvUnit(self.features, self.dtype)(x)
        if size is None:
            size = (x.shape[1] * 2, x.shape[2] * 2)
        # DPT fusion resizes are corner-aligned (reference blocks.py
        # align_corners=True).
        x = resize_bilinear_align_corners(x, *size)
        return nn.Conv(self.features, (1, 1), dtype=self.dtype,
                       param_dtype=jnp.float32)(x)


class DPTHead(nn.Module):
    features: int = 256
    out_channels: Tuple[int, ...] = (256, 512, 1024, 1024)
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, layer_feats, patch_hw):
        ph, pw = patch_hw
        maps = []
        for i, (tokens, _cls) in enumerate(layer_feats):
            B, N, D = tokens.shape
            x = tokens.reshape(B, ph, pw, D)
            x = nn.Conv(self.out_channels[i], (1, 1), dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"project_{i}")(x)
            if i == 0:
                # transpose_kernel=True = torch ConvTranspose2d semantics
                # (kernel [kh, kw, out, in], spatially flipped).
                x = nn.ConvTranspose(
                    self.out_channels[i], (4, 4), strides=(4, 4),
                    transpose_kernel=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="resize_0",
                )(x)
            elif i == 1:
                x = nn.ConvTranspose(
                    self.out_channels[i], (2, 2), strides=(2, 2),
                    transpose_kernel=True,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="resize_1",
                )(x)
            elif i == 3:
                x = nn.Conv(
                    self.out_channels[i], (3, 3), strides=(2, 2), padding=1,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name="resize_3",
                )(x)
            maps.append(x)

        rn = [
            nn.Conv(self.features, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"layer{i + 1}_rn")(m)
            for i, m in enumerate(maps)
        ]

        path = FeatureFusionBlock(self.features, self.dtype, name="refinenet4")(
            rn[3], size=rn[2].shape[1:3]
        )
        path = FeatureFusionBlock(self.features, self.dtype, name="refinenet3")(
            path, rn[2], size=rn[1].shape[1:3]
        )
        path = FeatureFusionBlock(self.features, self.dtype, name="refinenet2")(
            path, rn[1], size=rn[0].shape[1:3]
        )
        path = FeatureFusionBlock(self.features, self.dtype, name="refinenet1")(
            path, rn[0]
        )

        out = nn.Conv(self.features // 2, (3, 3), padding=1, dtype=self.dtype,
                      param_dtype=jnp.float32, name="output_conv1")(path)
        out = resize_bilinear_align_corners(out, ph * PATCH, pw * PATCH)
        out = nn.relu(
            nn.Conv(32, (3, 3), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="output_conv2_0")(out)
        )
        out = nn.Conv(1, (1, 1), dtype=self.dtype, param_dtype=jnp.float32,
                      name="output_conv2_2")(out)
        return nn.sigmoid(out.astype(jnp.float32))


class DepthAnythingV2(nn.Module):
    """Metric-depth transformer; input [B, H, W, 3] in [0,1], H/W % 14 == 0.

    Output: [B, H, W] metric depth in (0, max_depth)
    (reference ``dpt.py:152-186``: sigmoid head x max_depth).
    """

    encoder: str = "vits"
    max_depth: float = 20.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        cfg = VIT_CONFIGS[self.encoder]
        mean = jnp.asarray(IMAGENET_MEAN)
        std = jnp.asarray(IMAGENET_STD)
        x = (x - mean) / std

        feats, patch_hw = DINOv2(
            embed_dim=cfg["embed_dim"],
            depth=cfg["depth"],
            num_heads=cfg["num_heads"],
            dtype=self.dtype,
            name="pretrained",
        )(x, cfg["layers"])
        depth = DPTHead(
            features=cfg["features"],
            out_channels=tuple(cfg["out_channels"]),
            dtype=self.dtype,
            name="depth_head",
        )(feats, patch_hw)
        return depth[..., 0] * self.max_depth
