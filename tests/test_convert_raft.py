"""Whole-model numeric parity: converter + Flax SmallRAFT == torch.

Builds a reference-architecture torch SmallRAFT by hand (the vendored code
is not imported), loads the SAME random weights into both frameworks via
``convert_raft``, and compares per-iteration flows — pinning encoders,
correlation pyramid + windowed lookup (incl. the reference's x-major window
channel order), ConvGRU recurrence, and corner-aligned x8 upsampling."""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.models.raft import SmallRAFT
from deep_visual_slam_tpu.utils.torch_weights import convert_raft

RADIUS, LEVELS = 3, 4


def _inorm(c):
    return nn.InstanceNorm2d(c)


class TBottleneck(nn.Module):
    def __init__(self, inp, planes, norm, stride=1):
        super().__init__()
        q = planes // 4
        self.conv1 = nn.Conv2d(inp, q, 1)
        self.conv2 = nn.Conv2d(q, q, 3, stride, 1)
        self.conv3 = nn.Conv2d(q, planes, 1)
        mk = _inorm if norm == "instance" else (lambda c: nn.Sequential())
        self.norm1, self.norm2, self.norm3 = mk(q), mk(q), mk(planes)
        self.downsample = None
        if stride != 1:
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, planes, 1, stride), mk(planes)
            )

    def forward(self, x):
        y = torch.relu(self.norm1(self.conv1(x)))
        y = torch.relu(self.norm2(self.conv2(y)))
        y = torch.relu(self.norm3(self.conv3(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return torch.relu(x + y)


class TSmallEncoder(nn.Module):
    def __init__(self, output_dim, norm):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 32, 7, 2, 3)
        self.norm1 = _inorm(32) if norm == "instance" else nn.Sequential()
        layers = []
        inp = 32
        for dim, stride in ((32, 1), (64, 2), (96, 2)):
            layers.append(nn.Sequential(
                TBottleneck(inp, dim, norm, stride), TBottleneck(dim, dim, norm, 1)
            ))
            inp = dim
        self.layer1, self.layer2, self.layer3 = layers
        self.conv2 = nn.Conv2d(96, output_dim, 1)

    def forward(self, x):
        x = torch.relu(self.norm1(self.conv1(x)))
        for layer in (self.layer1, self.layer2, self.layer3):
            x = layer(x)
        return self.conv2(x)


class TUpdateBlock(nn.Module):
    """SmallMotionEncoder + ConvGRU + FlowHead, reference naming."""

    def __init__(self, corr_planes, hdim=96):
        super().__init__()
        enc = nn.Module()
        enc.convc1 = nn.Conv2d(corr_planes, 96, 1)
        enc.convf1 = nn.Conv2d(2, 64, 7, padding=3)
        enc.convf2 = nn.Conv2d(64, 32, 3, padding=1)
        enc.conv = nn.Conv2d(128, 80, 3, padding=1)
        self.encoder = enc
        gru = nn.Module()
        gru.convz = nn.Conv2d(hdim + 82 + 64, hdim, 3, padding=1)
        gru.convr = nn.Conv2d(hdim + 82 + 64, hdim, 3, padding=1)
        gru.convq = nn.Conv2d(hdim + 82 + 64, hdim, 3, padding=1)
        self.gru = gru
        fh = nn.Module()
        fh.conv1 = nn.Conv2d(hdim, 128, 3, padding=1)
        fh.conv2 = nn.Conv2d(128, 2, 3, padding=1)
        self.flow_head = fh

    def forward(self, net, inp, corr, flow):
        e = self.encoder
        cor = F.relu(e.convc1(corr))
        flo = F.relu(e.convf2(F.relu(e.convf1(flow))))
        motion = torch.cat([F.relu(e.conv(torch.cat([cor, flo], 1))), flow], 1)
        x = torch.cat([inp, motion], 1)
        hx = torch.cat([net, x], 1)
        z = torch.sigmoid(self.gru.convz(hx))
        r = torch.sigmoid(self.gru.convr(hx))
        q = torch.tanh(self.gru.convq(torch.cat([r * net, x], 1)))
        net = (1 - z) * net + z * q
        delta = self.flow_head.conv2(F.relu(self.flow_head.conv1(net)))
        return net, delta


def _coords_grid(b, h, w):
    y, x = torch.meshgrid(torch.arange(h).float(), torch.arange(w).float())
    return torch.stack([x, y], dim=0)[None].repeat(b, 1, 1, 1)


def _bilinear_sampler(img, coords):
    H, W = img.shape[-2:]
    xg = 2 * coords[..., 0:1] / (W - 1) - 1
    yg = 2 * coords[..., 1:2] / (H - 1) - 1
    return F.grid_sample(img, torch.cat([xg, yg], -1), align_corners=True)


class TSmallRAFT(nn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = TSmallEncoder(128, "instance")
        self.cnet = TSmallEncoder(96 + 64, "none")
        self.update_block = TUpdateBlock(LEVELS * (2 * RADIUS + 1) ** 2)

    def forward(self, image1, image2, iters):
        image1, image2 = 2 * image1 - 1, 2 * image2 - 1
        f1, f2 = self.fnet(image1), self.fnet(image2)
        B, D, H, W = f1.shape
        corr = torch.einsum("bdxy,bduv->bxyuv", f1, f2) / np.sqrt(D)
        pyramid = [corr.reshape(B * H * W, 1, H, W)]
        for _ in range(LEVELS - 1):
            pyramid.append(F.avg_pool2d(pyramid[-1], 2, stride=2))

        ctx = self.cnet(image1)
        net, inp = torch.tanh(ctx[:, :96]), torch.relu(ctx[:, 96:])
        coords0 = _coords_grid(B, H, W)
        coords1 = coords0.clone()

        r = RADIUS
        d = torch.linspace(-r, r, 2 * r + 1)
        # Reference quirk: meshgrid(dy, dx) added to the (x, y) centroid.
        delta = torch.stack(torch.meshgrid(d, d), dim=-1).view(1, 2 * r + 1, 2 * r + 1, 2)

        flows = []
        for _ in range(iters):
            coords1 = coords1.detach()
            out = []
            for i, c in enumerate(pyramid):
                centroid = coords1.permute(0, 2, 3, 1).reshape(B * H * W, 1, 1, 2) / 2**i
                sampled = _bilinear_sampler(c, centroid + delta)
                out.append(sampled.view(B, H, W, -1))
            corr_feat = torch.cat(out, dim=-1).permute(0, 3, 1, 2)
            flow = coords1 - coords0
            net, dflow = self.update_block(net, inp, corr_feat, flow)
            coords1 = coords1 + dflow
            up = 8 * F.interpolate(
                coords1 - coords0, scale_factor=8, mode="bilinear",
                align_corners=True,
            )
            flows.append(up)
        return flows


def test_small_raft_full_parity(rng):
    ITERS = 3
    torch.manual_seed(0)
    tmodel = TSmallRAFT().eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    variables = convert_raft(sd, small=True)
    fmodel = SmallRAFT(iters=ITERS)

    # 1/8-res fmaps are 16x20 -> the 4-level pyramid bottoms out at 2x2;
    # smaller inputs degenerate to 1x1 levels where torch's (W-1) coordinate
    # normalization divides by zero.
    H, W = 128, 160
    x1 = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    x2 = rng.uniform(size=(1, H, W, 3)).astype(np.float32)

    flows_flax = fmodel.apply(variables, jnp.asarray(x1), jnp.asarray(x2))
    with torch.no_grad():
        flows_torch = tmodel(
            torch.from_numpy(x1).permute(0, 3, 1, 2),
            torch.from_numpy(x2).permute(0, 3, 1, 2),
            ITERS,
        )

    assert len(flows_flax) == ITERS
    for i in range(ITERS):
        a = np.asarray(flows_flax[i])
        b = flows_torch[i].permute(0, 2, 3, 1).numpy()
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=1e-4, err_msg=f"iter {i}")


def test_convert_raft_memory_efficient_matches(rng):
    """The lazy (alt_cuda_corr-equivalent) lookup gives the same flows with
    converted weights."""
    torch.manual_seed(0)
    sd = {k: v.detach().numpy() for k, v in TSmallRAFT().state_dict().items()}
    variables = convert_raft(sd)
    H, W = 128, 160
    x1 = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    x2 = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    f_dense = SmallRAFT(iters=2).apply(variables, jnp.asarray(x1), jnp.asarray(x2))
    f_lazy = SmallRAFT(iters=2, memory_efficient=True).apply(
        variables, jnp.asarray(x1), jnp.asarray(x2)
    )
    np.testing.assert_allclose(
        np.asarray(f_dense[-1]), np.asarray(f_lazy[-1]), atol=1e-4
    )


def test_flow_posenet_with_converted_frozen_raft(rng):
    """FlowPoseNet is constructible around a frozen converted SmallRAFT
    (reference model/posenet_single.py:91-147)."""
    from deep_visual_slam_tpu.models.flow_posenet import FlowPoseNet

    torch.manual_seed(1)
    sd = {k: v.detach().numpy() for k, v in TSmallRAFT().state_dict().items()}
    raft_vars = convert_raft(sd)

    model = FlowPoseNet(iters=2)
    pair = jnp.asarray(rng.uniform(size=(1, 64, 96, 6)).astype(np.float32))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pair)
    # Graft the converted flow backbone into the pose net's variables.
    params = dict(variables["params"])
    assert "flow_net" in params, sorted(params)
    flat_new = jax.tree_util.tree_leaves(raft_vars["params"])
    flat_old = jax.tree_util.tree_leaves(params["flow_net"])
    assert len(flat_new) == len(flat_old)
    params["flow_net"] = raft_vars["params"]
    aa, t = model.apply({"params": params}, pair)
    assert np.isfinite(np.asarray(aa)).all() and np.isfinite(np.asarray(t)).all()


# ---------------------------------------------------------------------------
# Basic variant (ResidualBlock encoders, batch-normed cnet, SepConvGRU,
# convex upsampling)
# ---------------------------------------------------------------------------

B_RADIUS = 4


class TResidual(nn.Module):
    def __init__(self, inp, planes, norm, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(inp, planes, 3, stride, 1)
        self.conv2 = nn.Conv2d(planes, planes, 3, 1, 1)
        if norm == "batch":
            mk = lambda c: nn.BatchNorm2d(c)
        elif norm == "instance":
            mk = _inorm
        else:
            mk = lambda c: nn.Sequential()
        self.norm1, self.norm2 = mk(planes), mk(planes)
        self.downsample = None
        if stride != 1:
            self.norm3 = mk(planes)
            self.downsample = nn.Sequential(
                nn.Conv2d(inp, planes, 1, stride), self.norm3
            )

    def forward(self, x):
        y = torch.relu(self.norm1(self.conv1(x)))
        y = torch.relu(self.norm2(self.conv2(y)))
        if self.downsample is not None:
            x = self.downsample(x)
        return torch.relu(x + y)


class TBasicEncoder(nn.Module):
    def __init__(self, output_dim, norm):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3)
        if norm == "batch":
            self.norm1 = nn.BatchNorm2d(64)
        elif norm == "instance":
            self.norm1 = _inorm(64)
        else:
            self.norm1 = nn.Sequential()
        layers = []
        inp = 64
        for dim, stride in ((64, 1), (96, 2), (128, 2)):
            layers.append(nn.Sequential(
                TResidual(inp, dim, norm, stride), TResidual(dim, dim, norm, 1)
            ))
            inp = dim
        self.layer1, self.layer2, self.layer3 = layers
        self.conv2 = nn.Conv2d(128, output_dim, 1)

    def forward(self, x):
        x = torch.relu(self.norm1(self.conv1(x)))
        for layer in (self.layer1, self.layer2, self.layer3):
            x = layer(x)
        return self.conv2(x)


class TBasicUpdate(nn.Module):
    def __init__(self, corr_planes, hdim=128):
        super().__init__()
        enc = nn.Module()
        enc.convc1 = nn.Conv2d(corr_planes, 256, 1)
        enc.convc2 = nn.Conv2d(256, 192, 3, padding=1)
        enc.convf1 = nn.Conv2d(2, 128, 7, padding=3)
        enc.convf2 = nn.Conv2d(128, 64, 3, padding=1)
        enc.conv = nn.Conv2d(256, 126, 3, padding=1)
        self.encoder = enc
        gru = nn.Module()
        for i, k, p in ((1, (1, 5), (0, 2)), (2, (5, 1), (2, 0))):
            for g in "zrq":
                setattr(gru, f"conv{g}{i}", nn.Conv2d(hdim + 256, hdim, k, padding=p))
        self.gru = gru
        fh = nn.Module()
        fh.conv1 = nn.Conv2d(hdim, 256, 3, padding=1)
        fh.conv2 = nn.Conv2d(256, 2, 3, padding=1)
        self.flow_head = fh
        self.mask = nn.Sequential(
            nn.Conv2d(128, 256, 3, padding=1), nn.ReLU(), nn.Conv2d(256, 64 * 9, 1)
        )

    def forward(self, net, inp, corr, flow):
        e = self.encoder
        cor = F.relu(e.convc2(F.relu(e.convc1(corr))))
        flo = F.relu(e.convf2(F.relu(e.convf1(flow))))
        motion = torch.cat([F.relu(e.conv(torch.cat([cor, flo], 1))), flow], 1)
        x = torch.cat([inp, motion], 1)
        g = self.gru
        for i in (1, 2):
            hx = torch.cat([net, x], 1)
            z = torch.sigmoid(getattr(g, f"convz{i}")(hx))
            r = torch.sigmoid(getattr(g, f"convr{i}")(hx))
            q = torch.tanh(getattr(g, f"convq{i}")(torch.cat([r * net, x], 1)))
            net = (1 - z) * net + z * q
        delta = self.flow_head.conv2(F.relu(self.flow_head.conv1(net)))
        mask = 0.25 * self.mask(net)
        return net, mask, delta


def _upsample_flow_torch(flow, mask):
    N, _, H, W = flow.shape
    mask = mask.view(N, 1, 9, 8, 8, H, W)
    mask = torch.softmax(mask, dim=2)
    up = F.unfold(8 * flow, [3, 3], padding=1).view(N, 2, 9, 1, 1, H, W)
    up = torch.sum(mask * up, dim=2)
    up = up.permute(0, 1, 4, 2, 5, 3)
    return up.reshape(N, 2, 8 * H, 8 * W)


class TBasicRAFT(nn.Module):
    def __init__(self):
        super().__init__()
        self.fnet = TBasicEncoder(256, "instance")
        self.cnet = TBasicEncoder(128 + 128, "batch")
        self.update_block = TBasicUpdate(LEVELS * (2 * B_RADIUS + 1) ** 2)

    def forward(self, image1, image2, iters):
        image1, image2 = 2 * image1 - 1, 2 * image2 - 1
        f1, f2 = self.fnet(image1), self.fnet(image2)
        B, D, H, W = f1.shape
        corr = torch.einsum("bdxy,bduv->bxyuv", f1, f2) / np.sqrt(D)
        pyramid = [corr.reshape(B * H * W, 1, H, W)]
        for _ in range(LEVELS - 1):
            pyramid.append(F.avg_pool2d(pyramid[-1], 2, stride=2))

        ctx = self.cnet(image1)
        net, inp = torch.tanh(ctx[:, :128]), torch.relu(ctx[:, 128:])
        coords0 = _coords_grid(B, H, W)
        coords1 = coords0.clone()

        r = B_RADIUS
        d = torch.linspace(-r, r, 2 * r + 1)
        delta = torch.stack(torch.meshgrid(d, d), dim=-1).view(1, 2 * r + 1, 2 * r + 1, 2)

        flows = []
        for _ in range(iters):
            coords1 = coords1.detach()
            out = []
            for i, c in enumerate(pyramid):
                centroid = coords1.permute(0, 2, 3, 1).reshape(B * H * W, 1, 1, 2) / 2**i
                out.append(_bilinear_sampler(c, centroid + delta).view(B, H, W, -1))
            corr_feat = torch.cat(out, dim=-1).permute(0, 3, 1, 2)
            flow = coords1 - coords0
            net, mask, dflow = self.update_block(net, inp, corr_feat, flow)
            coords1 = coords1 + dflow
            flows.append(_upsample_flow_torch(coords1 - coords0, mask))
        return flows


def test_basic_raft_full_parity(rng):
    from deep_visual_slam_tpu.models.raft import BasicRAFT

    ITERS = 2
    torch.manual_seed(3)
    tmodel = TBasicRAFT()
    for m in tmodel.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    tmodel.eval()
    sd = {k: v.detach().numpy() for k, v in tmodel.state_dict().items()}

    variables = convert_raft(sd, small=False)
    fmodel = BasicRAFT(iters=ITERS)

    H, W = 128, 160
    x1 = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    x2 = rng.uniform(size=(1, H, W, 3)).astype(np.float32)

    flows_flax = fmodel.apply(variables, jnp.asarray(x1), jnp.asarray(x2))
    with torch.no_grad():
        flows_torch = tmodel(
            torch.from_numpy(x1).permute(0, 3, 1, 2),
            torch.from_numpy(x2).permute(0, 3, 1, 2),
            ITERS,
        )
    for i in range(ITERS):
        a = np.asarray(flows_flax[i])
        b = flows_torch[i].permute(0, 2, 3, 1).numpy()
        assert a.shape == b.shape
        np.testing.assert_allclose(a, b, atol=2e-4, err_msg=f"iter {i}")
