"""Whole-model numeric parity: converter + Flax DepthAnythingV2 == torch.

Hand-built reference-architecture torch DA-V2 (vits): DINOv2 ViT with
LayerScale + exact GELU + eps=1e-6 LayerNorms, DPT head with ConvTranspose
resizes and corner-aligned fusion interpolation. Position embeddings are
resampled exactly as upstream DINOv2 does (bicubic a=-0.75 with the +0.1
offset scale, ``dinov2.py:194-205``), so parity holds at non-native input
sizes too — everything must match to 1e-4."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.models.depth_anything import DepthAnythingV2
from deep_visual_slam_tpu.utils.torch_weights import convert_depth_anything

DIM, HEADS, DEPTH = 384, 6, 12
OUT_CH = (48, 96, 192, 384)
FEAT = 64
LAYERS = (2, 5, 8, 11)
PATCH = 14


class TBlock(nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = nn.LayerNorm(DIM, eps=1e-6)
        attn = nn.Module()
        attn.qkv = nn.Linear(DIM, 3 * DIM)
        attn.proj = nn.Linear(DIM, DIM)
        self.attn = attn
        self.ls1 = nn.Module()
        self.ls1.gamma = nn.Parameter(torch.randn(DIM) * 0.1 + 1.0)
        self.norm2 = nn.LayerNorm(DIM, eps=1e-6)
        mlp = nn.Module()
        mlp.fc1 = nn.Linear(DIM, 4 * DIM)
        mlp.fc2 = nn.Linear(4 * DIM, DIM)
        self.mlp = mlp
        self.ls2 = nn.Module()
        self.ls2.gamma = nn.Parameter(torch.randn(DIM) * 0.1 + 1.0)

    def forward(self, x):
        B, N, _ = x.shape
        y = self.norm1(x)
        qkv = self.attn.qkv(y).reshape(B, N, 3, HEADS, DIM // HEADS)
        q, k, v = qkv.permute(2, 0, 3, 1, 4)
        y = F.scaled_dot_product_attention(q, k, v)
        y = y.transpose(1, 2).reshape(B, N, DIM)
        x = x + self.attn.proj(y) * self.ls1.gamma
        y = self.mlp.fc2(F.gelu(self.mlp.fc1(self.norm2(x))))
        return x + y * self.ls2.gamma


class TRCU(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(FEAT, FEAT, 3, padding=1)
        self.conv2 = nn.Conv2d(FEAT, FEAT, 3, padding=1)

    def forward(self, x):
        return x + self.conv2(F.relu(self.conv1(F.relu(x))))


class TFusion(nn.Module):
    def __init__(self):
        super().__init__()
        self.resConfUnit1 = TRCU()
        self.resConfUnit2 = TRCU()
        self.out_conv = nn.Conv2d(FEAT, FEAT, 1)

    def forward(self, x, res=None, size=None):
        if res is not None:
            x = x + self.resConfUnit1(res)
        x = self.resConfUnit2(x)
        if size is None:
            size = (x.shape[2] * 2, x.shape[3] * 2)
        x = F.interpolate(x, size=size, mode="bilinear", align_corners=True)
        return self.out_conv(x)


class TDepthAnything(nn.Module):
    def __init__(self, max_depth=20.0):
        super().__init__()
        self.max_depth = max_depth
        pre = nn.Module()
        pre.cls_token = nn.Parameter(torch.randn(1, 1, DIM) * 0.02)
        pre.pos_embed = nn.Parameter(torch.randn(1, 37 * 37 + 1, DIM) * 0.02)
        embed = nn.Module()
        embed.proj = nn.Conv2d(3, DIM, PATCH, stride=PATCH)
        pre.patch_embed = embed
        pre.blocks = nn.ModuleList([TBlock() for _ in range(DEPTH)])
        pre.norm = nn.LayerNorm(DIM, eps=1e-6)
        self.pretrained = pre

        head = nn.Module()
        head.projects = nn.ModuleList(
            [nn.Conv2d(DIM, c, 1) for c in OUT_CH]
        )
        head.resize_layers = nn.ModuleList([
            nn.ConvTranspose2d(OUT_CH[0], OUT_CH[0], 4, stride=4),
            nn.ConvTranspose2d(OUT_CH[1], OUT_CH[1], 2, stride=2),
            nn.Identity(),
            nn.Conv2d(OUT_CH[3], OUT_CH[3], 3, stride=2, padding=1),
        ])
        scratch = nn.Module()
        for i, c in enumerate(OUT_CH):
            setattr(scratch, f"layer{i + 1}_rn",
                    nn.Conv2d(c, FEAT, 3, padding=1, bias=False))
        for i in (1, 2, 3, 4):
            setattr(scratch, f"refinenet{i}", TFusion())
        scratch.output_conv1 = nn.Conv2d(FEAT, FEAT // 2, 3, padding=1)
        scratch.output_conv2 = nn.Sequential(
            nn.Conv2d(FEAT // 2, 32, 3, padding=1),
            nn.ReLU(),
            nn.Conv2d(32, 1, 1),
        )
        head.scratch = scratch
        self.depth_head = head

    def forward(self, x):
        mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
        std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
        x = (x - mean) / std
        B, _, H, W = x.shape
        ph, pw = H // PATCH, W // PATCH

        pre = self.pretrained
        t = pre.patch_embed.proj(x).flatten(2).transpose(1, 2)  # [B, N, D]
        pos = pre.pos_embed
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        grid = patch_pos.reshape(1, 37, 37, DIM).permute(0, 3, 1, 2)
        # Exactly DINOv2's interpolate_pos_encoding: bicubic with the
        # +0.1-offset explicit scale factor (reference dinov2.py:194-205).
        grid = F.interpolate(
            grid, scale_factor=((ph + 0.1) / 37, (pw + 0.1) / 37),
            mode="bicubic", antialias=False,
        )
        assert grid.shape[-2:] == (ph, pw)
        patch_pos = grid.permute(0, 2, 3, 1).reshape(1, ph * pw, DIM)
        t = t + patch_pos
        cls_tok = (pre.cls_token + cls_pos).expand(B, -1, -1)
        t = torch.cat([cls_tok, t], dim=1)

        feats = []
        for i, blk in enumerate(pre.blocks):
            t = blk(t)
            if i in LAYERS:
                feats.append(pre.norm(t)[:, 1:])

        head = self.depth_head
        maps = []
        for i, f in enumerate(feats):
            m = f.transpose(1, 2).reshape(B, DIM, ph, pw)
            m = head.projects[i](m)
            m = head.resize_layers[i](m)
            maps.append(m)
        s = head.scratch
        rn = [getattr(s, f"layer{i + 1}_rn")(m) for i, m in enumerate(maps)]
        path = s.refinenet4(rn[3], size=rn[2].shape[2:])
        path = s.refinenet3(path, rn[2], size=rn[1].shape[2:])
        path = s.refinenet2(path, rn[1], size=rn[0].shape[2:])
        path = s.refinenet1(path, rn[0])
        out = s.output_conv1(path)
        out = F.interpolate(out, size=(ph * PATCH, pw * PATCH),
                            mode="bilinear", align_corners=True)
        out = s.output_conv2(out)
        return torch.sigmoid(out) * self.max_depth


def test_depth_anything_full_parity(rng):
    torch.manual_seed(0)
    tmodel = TDepthAnything().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}
    # real checkpoints also carry a mask_token the converter must ignore
    sd["pretrained.mask_token"] = np.zeros((1, DIM), np.float32)

    variables = convert_depth_anything(sd, "vits")
    fmodel = DepthAnythingV2(encoder="vits", max_depth=20.0)

    # Non-square, off the 37x37 native grid -> exercises the bicubic
    # pos-embed resample on BOTH axes with distinct scales.
    H, W = 4 * PATCH, 6 * PATCH  # 56x84 -> 4x6 patch grid
    x = rng.uniform(size=(1, H, W, 3)).astype(np.float32)

    depth_flax = np.asarray(fmodel.apply(variables, jnp.asarray(x)))
    with torch.no_grad():
        depth_torch = tmodel(torch.from_numpy(x).permute(0, 3, 1, 2))
    depth_torch = depth_torch[:, 0].numpy()

    assert depth_flax.shape == depth_torch.shape == (1, H, W)
    np.testing.assert_allclose(depth_flax, depth_torch, atol=1e-4)


def test_predict_depth_anything_cli(tmp_path, rng, monkeypatch, capsys):
    """End-to-end CLI drive: .pth checkpoint -> converted+cached -> padded
    jitted inference -> 16-bit depth PNG (+ colormap)."""
    import cv2
    import sys

    from deep_visual_slam_tpu.predict_depth_anything import main

    torch.manual_seed(1)
    ckpt = str(tmp_path / "depth_anything_v2_vits.pth")
    torch.save(TDepthAnything().state_dict(), ckpt)

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    # 50x60 -> exercises padding to the 14-px grid (56x70)
    img = (rng.uniform(size=(50, 60, 3)) * 255).astype(np.uint8)
    cv2.imwrite(str(img_dir / "a.png"), img)

    out_dir = str(tmp_path / "out")
    monkeypatch.setattr(sys, "argv", [
        "predict_depth_anything", "--weights", ckpt, "--encoder", "vits",
        "--input", str(img_dir), "--output", out_dir, "--colormap",
    ])
    main()

    depth = cv2.imread(str(tmp_path / "out" / "a_depth.png"), cv2.IMREAD_UNCHANGED)
    assert depth is not None and depth.shape == (50, 60)
    assert depth.dtype == np.uint16
    assert 0 < depth.max() <= 20000  # mm, within max_depth
    assert (tmp_path / "out" / "a_depth_vis.png").exists()
    # the converted checkpoint was cached next to the .pth
    assert (tmp_path / "depth_anything_v2_vits.npz").exists()
