"""Numeric parity: Flax ResNetEncoder == torch ResNet-18 forward.

Builds a torch ResNet-18 by hand (torchvision is absent), loads the SAME
random weights into both frameworks via the converter, and compares the five
feature maps numerically — this pins padding, stride placement, BN-eval, and
the (x-0.45)/0.225 normalization all at once.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn

from deep_visual_slam_tpu.models import ResNetEncoder
from deep_visual_slam_tpu.utils.torch_weights import convert_resnet_encoder


class TorchBasicBlock(nn.Module):
    def __init__(self, inp, out, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, out, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(out)
        self.conv2 = nn.Conv2d(out, out, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(out)
        self.downsample = None
        if stride != 1 or inp != out:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, out, 1, stride, bias=False), nn.BatchNorm2d(out)
            )

    def forward(self, x):
        idt = x
        y = torch.relu(self.bn1(self.conv1(x)))
        y = self.bn2(self.conv2(y))
        if self.downsample is not None:
            idt = self.downsample(x)
        return torch.relu(y + idt)


class TorchResNet18(nn.Module):
    def __init__(self, in_ch=3):
        super().__init__()
        self.conv1 = nn.Conv2d(in_ch, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.maxpool = nn.MaxPool2d(3, 2, 1)
        widths = [64, 128, 256, 512]
        layers = []
        inp = 64
        for si, w in enumerate(widths):
            stride = 1 if si == 0 else 2
            layers.append(nn.Sequential(
                TorchBasicBlock(inp, w, stride), TorchBasicBlock(w, w, 1)
            ))
            inp = w
        self.layer1, self.layer2, self.layer3, self.layer4 = layers

    def forward(self, x):
        feats = []
        x = torch.relu(self.bn1(self.conv1(x)))
        feats.append(x)
        x = self.maxpool(x)
        for layer in (self.layer1, self.layer2, self.layer3, self.layer4):
            x = layer(x)
            feats.append(x)
        return feats


def _torch_state_dict_resnet18(seed=0):
    torch.manual_seed(seed)
    net = TorchResNet18()
    # Randomize BN running stats too, so eval-mode normalization is non-trivial.
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.8, 1.2)
            m.bias.data.uniform_(-0.1, 0.1)
    return net


@pytest.mark.parametrize("num_input_images", [1, 2])
def test_resnet18_forward_parity(rng, num_input_images):
    net = _torch_state_dict_resnet18()
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    variables = convert_resnet_encoder(sd, 18, num_input_images)
    enc = ResNetEncoder(num_layers=18, num_input_images=num_input_images)

    H, W = 64, 96
    C = 3 * num_input_images
    x = rng.uniform(size=(2, H, W, C)).astype(np.float32)

    import jax.numpy as jnp

    feats_flax = enc.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x),
        train=False,
    )

    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    xt = (xt - 0.45) / 0.225  # encoder normalization, applied inside flax enc
    if num_input_images > 1:
        # Tile torch conv1 weights the same way the converter does.
        w = net.conv1.weight.data
        net.conv1 = nn.Conv2d(C, 64, 7, 2, 3, bias=False)
        net.conv1.weight.data = torch.cat([w] * num_input_images, 1) / num_input_images
        net.eval()
    with torch.no_grad():
        feats_torch = net(xt)

    assert len(feats_flax) == len(feats_torch) == 5
    for i, (a, b) in enumerate(zip(feats_flax, feats_torch)):
        a = np.asarray(a)
        b = b.permute(0, 2, 3, 1).numpy()
        assert a.shape == b.shape, (i, a.shape, b.shape)
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=f"feature {i}")


class _TorchConv3x3(nn.Module):
    def __init__(self, inp, out):
        super().__init__()
        self.pad = nn.ReflectionPad2d(1)
        self.conv = nn.Conv2d(inp, out, 3)

    def forward(self, x):
        return self.conv(self.pad(x))


class _TorchConvBlock(nn.Module):
    def __init__(self, inp, out):
        super().__init__()
        self.conv = _TorchConv3x3(inp, out)
        self.nonlin = nn.ELU()

    def forward(self, x):
        return self.nonlin(self.conv(x))


class TorchDepthNet(nn.Module):
    """Reference-architecture DepthNet rebuilt for the parity test."""

    def __init__(self):
        super().__init__()
        self.encoder = nn.Module()
        self.encoder.encoder = TorchResNet18()
        num_ch_enc = [64, 64, 128, 256, 512]
        num_ch_dec = [16, 32, 64, 128, 256]
        convs = []
        for i in range(4, -1, -1):
            cin = num_ch_enc[-1] if i == 4 else num_ch_dec[i + 1]
            convs.append(_TorchConvBlock(cin, num_ch_dec[i]))
            cin = num_ch_dec[i] + (num_ch_enc[i - 1] if i > 0 else 0)
            convs.append(_TorchConvBlock(cin, num_ch_dec[i]))
        for s in range(4):
            convs.append(_TorchConv3x3(num_ch_dec[s], 1))
        self.decoder = nn.ModuleList(convs)

    def forward(self, x):
        x = (x - 0.45) / 0.225
        e = self.encoder.encoder
        feats = []
        y = torch.relu(e.bn1(e.conv1(x)))
        feats.append(y)
        y = e.maxpool(y)
        for layer in (e.layer1, e.layer2, e.layer3, e.layer4):
            y = layer(y)
            feats.append(y)
        outputs = {}
        y = feats[-1]
        for k, i in enumerate(range(4, -1, -1)):
            y = self.decoder[2 * k](y)
            y = nn.functional.interpolate(y, scale_factor=2, mode="nearest")
            if i > 0:
                y = torch.cat([y, feats[i - 1]], 1)
            y = self.decoder[2 * k + 1](y)
            if i in range(4):
                outputs[i] = torch.sigmoid(self.decoder[10 + i](y))
        return outputs


def test_depthnet_full_parity(rng):
    """Whole-model numeric parity: converter + Flax DepthNet == torch."""
    from deep_visual_slam_tpu.models import DepthNet
    from deep_visual_slam_tpu.utils.torch_weights import convert_depthnet

    torch.manual_seed(1)
    net = TorchDepthNet()
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}

    variables = convert_depthnet(sd)
    flax_net = DepthNet()
    x = rng.uniform(size=(1, 64, 96, 3)).astype(np.float32)

    import jax.numpy as jnp

    out_flax = flax_net.apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        out_torch = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    for s in range(4):
        a = np.asarray(out_flax[("disp", s)])
        b = out_torch[s].permute(0, 2, 3, 1).numpy()
        np.testing.assert_allclose(a, b, atol=5e-5, err_msg=f"disp {s}")


def test_posenet_full_parity(rng):
    from deep_visual_slam_tpu.models import PoseNet
    from deep_visual_slam_tpu.utils.torch_weights import convert_posenet

    class TorchPoseNet(nn.Module):
        def __init__(self):
            super().__init__()
            self.encoder = nn.Module()
            self.encoder.encoder = TorchResNet18(in_ch=6)
            self.net = nn.ModuleList([
                nn.Conv2d(512, 256, 1),
                nn.Conv2d(256, 256, 3, 1, 1),
                nn.Conv2d(256, 256, 3, 1, 1),
                nn.Conv2d(256, 6, 1),
            ])

        def forward(self, x):
            x = (x - 0.45) / 0.225
            e = self.encoder.encoder
            y = torch.relu(e.bn1(e.conv1(x)))
            y = e.maxpool(y)
            for layer in (e.layer1, e.layer2, e.layer3, e.layer4):
                y = layer(y)
            y = torch.relu(self.net[0](y))
            y = torch.relu(self.net[1](y))
            y = torch.relu(self.net[2](y))
            y = self.net[3](y)
            out = 0.01 * y.mean(3).mean(2).view(-1, 1, 1, 6)
            return out[..., :3], out[..., 3:]

    torch.manual_seed(2)
    net = TorchPoseNet()
    for m in net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    net.eval()
    sd = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    variables = convert_posenet(sd)

    from deep_visual_slam_tpu.models import PoseNet
    import jax.numpy as jnp

    x = rng.uniform(size=(2, 64, 96, 6)).astype(np.float32)
    aa_f, t_f = PoseNet().apply(
        {"params": variables["params"], "batch_stats": variables["batch_stats"]},
        jnp.asarray(x), train=False,
    )
    with torch.no_grad():
        aa_t, t_t = net(torch.from_numpy(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(np.asarray(aa_f), aa_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(np.asarray(t_f), t_t.numpy(), atol=1e-6)


def test_strip_compile_prefix():
    from deep_visual_slam_tpu.utils.torch_weights import strip_compile_prefix

    sd = {"_orig_mod.encoder.conv1.weight": 1, "plain.key": 2}
    out = strip_compile_prefix(sd)
    assert out == {"encoder.conv1.weight": 1, "plain.key": 2}
