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
