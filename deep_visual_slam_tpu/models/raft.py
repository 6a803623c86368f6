"""RAFT / SmallRAFT optical flow in Flax (NHWC, TPU-native).

Parity target: reference ``model/raft/core/`` (vendored RAFT):
  - feature + context encoders (``extractor.py``: conv7x7 s2 + 3 residual
    stages + 1x1 head; Small variant uses bottleneck blocks at 32/64/96),
  - 4-level all-pairs correlation pyramid with radius-r bilinear lookup
    (``corr.py:12-60``), normalized by sqrt(D),
  - ConvGRU / SepConvGRU iterative refinement with motion encoders
    (``update.py``), 12 iterations (``raft.py:104-119``),
  - flow upsampling: x8 bilinear (Small) or learned convex combination over
    3x3 neighborhoods (Basic, ``raft.py:53-66``).

TPU-native:
  - the 12 GRU iterations run as one ``nn.scan`` (weight-tied body, ONE
    compiled copy of the update block; see ``_UpdateLoopBody``) — measured
    640x480 SmallRAFT forward compile on the real chip: 13.4 s vs 40.8 s
    for the Python-unrolled variant, identical throughput,
  - correlation is an einsum on the MXU; lookup is the framework's
    grid_sample (zero padding, align_corners=True like RAFT's sampler),
  - a memory-efficient chunked lookup (``ops/pallas/correlation.py``)
    replaces the reference's ``alt_cuda_corr`` CUDA extension.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from deep_visual_slam_tpu.ops.pallas.correlation import (
    corr_pyramid_lookup,
    build_corr_pyramid,
)
from deep_visual_slam_tpu.ops.warp import resize_bilinear_align_corners


def _conv(f, k, s=1, name=None, dtype=jnp.float32):
    return nn.Conv(
        f, (k, k), strides=(s, s), padding=((k // 2, k // 2),) * 2,
        dtype=dtype, param_dtype=jnp.float32, name=name,
        kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
    )


class _Norm(nn.Module):
    """norm_fn dispatch matching the reference extractor (group / batch /
    instance / none). Instance = GroupNorm(groups=C) without affine params
    (torch InstanceNorm2d default)."""

    kind: str
    channels: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        # epsilon=1e-5 matches torch's InstanceNorm2d/GroupNorm default
        # (flax's 1e-6 default costs ~5e-4 of checkpoint parity).
        if self.kind == "group":
            return nn.GroupNorm(
                num_groups=max(self.channels // 8, 1), epsilon=1e-5,
                dtype=self.dtype,
            )(x)
        if self.kind == "batch":
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, dtype=self.dtype
            )(x)
        if self.kind == "instance":
            return nn.GroupNorm(
                num_groups=self.channels, use_bias=False, use_scale=False,
                epsilon=1e-5, dtype=self.dtype,
            )(x)
        return x  # "none"


class ResidualBlock(nn.Module):
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = _conv(self.planes, 3, self.stride, dtype=self.dtype)(x)
        y = nn.relu(_Norm(self.norm_fn, self.planes, self.dtype)(y, train))
        y = _conv(self.planes, 3, 1, dtype=self.dtype)(y)
        y = nn.relu(_Norm(self.norm_fn, self.planes, self.dtype)(y, train))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = _conv(self.planes, 1, self.stride, dtype=self.dtype)(x)
            x = _Norm(self.norm_fn, self.planes, self.dtype)(x, train)
        return nn.relu(x + y)


class BottleneckBlock(nn.Module):
    planes: int
    norm_fn: str = "group"
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        q = self.planes // 4
        y = _conv(q, 1, 1, dtype=self.dtype)(x)
        y = nn.relu(_Norm(self.norm_fn, q, self.dtype)(y, train))
        y = _conv(q, 3, self.stride, dtype=self.dtype)(y)
        y = nn.relu(_Norm(self.norm_fn, q, self.dtype)(y, train))
        y = _conv(self.planes, 1, 1, dtype=self.dtype)(y)
        y = nn.relu(_Norm(self.norm_fn, self.planes, self.dtype)(y, train))
        if self.stride != 1 or x.shape[-1] != self.planes:
            x = _conv(self.planes, 1, self.stride, dtype=self.dtype)(x)
            x = _Norm(self.norm_fn, self.planes, self.dtype)(x, train)
        return nn.relu(x + y)


class Encoder(nn.Module):
    """Feature/context encoder, 1/8 resolution output.

    small=True: 32-64-96 bottleneck stages (reference ``SmallEncoder``);
    small=False: 64-96-128 residual stages (reference ``BasicEncoder``).
    """

    output_dim: int = 128
    norm_fn: str = "instance"
    small: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.small:
            stem, widths, block = 32, (32, 64, 96), BottleneckBlock
        else:
            stem, widths, block = 64, (64, 96, 128), ResidualBlock
        x = _conv(stem, 7, 2, dtype=self.dtype)(x)
        x = nn.relu(_Norm(self.norm_fn, stem, self.dtype)(x, train))
        for i, w in enumerate(widths):
            stride = 1 if i == 0 else 2
            x = block(w, self.norm_fn, stride, self.dtype)(x, train)
            x = block(w, self.norm_fn, 1, self.dtype)(x, train)
        return _conv(self.output_dim, 1, 1, dtype=self.dtype)(x)


class ConvGRU(nn.Module):
    hidden_dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        hx = jnp.concatenate([h, x], axis=-1)
        z = nn.sigmoid(_conv(self.hidden_dim, 3, dtype=self.dtype)(hx))
        r = nn.sigmoid(_conv(self.hidden_dim, 3, dtype=self.dtype)(hx))
        q = nn.tanh(
            _conv(self.hidden_dim, 3, dtype=self.dtype)(
                jnp.concatenate([r * h, x], axis=-1)
            )
        )
        return (1 - z) * h + z * q


class SepConvGRU(nn.Module):
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, h, x):
        def gate(k, inp, name):
            kh, kw = k
            return nn.Conv(
                self.hidden_dim, (kh, kw),
                padding=((kh // 2, kh // 2), (kw // 2, kw // 2)),
                dtype=self.dtype, param_dtype=jnp.float32, name=name,
            )(inp)

        # horizontal (1x5) then vertical (5x1) pass.
        for axis, k in (("h", (1, 5)), ("v", (5, 1))):
            hx = jnp.concatenate([h, x], axis=-1)
            z = nn.sigmoid(gate(k, hx, f"convz_{axis}"))
            r = nn.sigmoid(gate(k, hx, f"convr_{axis}"))
            q = nn.tanh(
                gate(k, jnp.concatenate([r * h, x], axis=-1), f"convq_{axis}")
            )
            h = (1 - z) * h + z * q
        return h


class FlowHead(nn.Module):
    hidden_dim: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        x = nn.relu(_conv(self.hidden_dim, 3, dtype=self.dtype)(x))
        return _conv(2, 3, dtype=self.dtype)(x).astype(jnp.float32)


class SmallMotionEncoder(nn.Module):
    corr_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(_conv(96, 1, dtype=self.dtype)(corr))
        flo = nn.relu(_conv(64, 7, dtype=self.dtype)(flow))
        flo = nn.relu(_conv(32, 3, dtype=self.dtype)(flo))
        out = nn.relu(
            _conv(80, 3, dtype=self.dtype)(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, flow], axis=-1)  # 82 channels


class BasicMotionEncoder(nn.Module):
    corr_planes: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, flow, corr):
        cor = nn.relu(_conv(256, 1, dtype=self.dtype)(corr))
        cor = nn.relu(_conv(192, 3, dtype=self.dtype)(cor))
        flo = nn.relu(_conv(128, 7, dtype=self.dtype)(flow))
        flo = nn.relu(_conv(64, 3, dtype=self.dtype)(flo))
        out = nn.relu(
            _conv(126, 3, dtype=self.dtype)(jnp.concatenate([cor, flo], -1))
        )
        return jnp.concatenate([out, flow], axis=-1)  # 128 channels


class SmallUpdateBlock(nn.Module):
    corr_planes: int
    hidden_dim: int = 96
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = SmallMotionEncoder(self.corr_planes, self.dtype)(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = ConvGRU(self.hidden_dim, self.dtype)(net, x)
        delta = FlowHead(128, self.dtype)(net)
        return net, None, delta


class BasicUpdateBlock(nn.Module):
    corr_planes: int
    hidden_dim: int = 128
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, net, inp, corr, flow):
        motion = BasicMotionEncoder(self.corr_planes, self.dtype)(flow, corr)
        x = jnp.concatenate([inp, motion], axis=-1)
        net = SepConvGRU(self.hidden_dim, self.dtype)(net, x)
        delta = FlowHead(256, self.dtype)(net)
        # Convex-upsampling mask, scaled by .25 (upstream RAFT convention).
        mask = nn.relu(_conv(256, 3, dtype=self.dtype)(net))
        mask = 0.25 * _conv(64 * 9, 1, dtype=self.dtype)(mask)
        return net, mask.astype(jnp.float32), delta


class _UpdateLoopBody(nn.Module):
    """One GRU refinement iteration: correlation lookup -> update block ->
    flow upsample. Scanned with ``nn.scan`` (weight-tied body) so the XLA
    program contains ONE copy of the update block instead of ``iters``
    unrolled copies — at 640x480 over a remote-TPU link the unrolled variant
    costs minutes of extra compile time."""

    small: bool
    corr_planes: int
    hidden_dim: int
    radius: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, pyramid, coords0, inp):
        net, coords1 = carry
        coords1 = jax.lax.stop_gradient(coords1)
        corr = corr_pyramid_lookup(pyramid, coords1, self.radius)
        flow = coords1 - coords0
        update = (
            SmallUpdateBlock(
                self.corr_planes, self.hidden_dim, self.dtype, name="update"
            )
            if self.small
            else BasicUpdateBlock(
                self.corr_planes, self.hidden_dim, self.dtype, name="update"
            )
        )
        net, up_mask, delta = update(net, inp, corr, flow)
        coords1 = coords1 + delta
        if up_mask is None:
            up = upflow8(coords1 - coords0)
        else:
            up = upsample_flow_convex(coords1 - coords0, up_mask)
        return (net, coords1), up


def coords_grid(batch: int, h: int, w: int) -> jnp.ndarray:
    """[B, H, W, 2] (x, y) pixel coordinate grid."""
    xs = jnp.arange(w, dtype=jnp.float32)
    ys = jnp.arange(h, dtype=jnp.float32)
    x, y = jnp.meshgrid(xs, ys, indexing="xy")
    return jnp.broadcast_to(jnp.stack([x, y], -1), (batch, h, w, 2))


def upsample_flow_convex(flow: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Learned x8 upsampling: per output pixel, a softmax-weighted combination
    of the 3x3 coarse neighborhood (reference ``raft.py:53-66``)."""
    B, H, W, _ = flow.shape
    mask = mask.reshape(B, H, W, 9, 8, 8)
    mask = jax.nn.softmax(mask, axis=3)

    # 3x3 neighborhoods of the (8x) scaled flow.
    pad = jnp.pad(8.0 * flow, ((0, 0), (1, 1), (1, 1), (0, 0)))
    neigh = jnp.stack(
        [
            pad[:, dy : dy + H, dx : dx + W, :]
            for dy in range(3)
            for dx in range(3)
        ],
        axis=3,
    )  # [B, H, W, 9, 2]
    up = jnp.einsum("bhwkuv,bhwkc->bhwuvc", mask, neigh)
    return up.transpose(0, 1, 3, 2, 4, 5).reshape(B, H * 8, W * 8, 2)


def upflow8(flow: jnp.ndarray) -> jnp.ndarray:
    """x8 bilinear flow upsample, corner-aligned like the reference
    (``raft.py`` upflow8: interpolate align_corners=True, x8 magnitudes)."""
    B, H, W, _ = flow.shape
    return 8.0 * resize_bilinear_align_corners(flow, H * 8, W * 8)


class RAFT(nn.Module):
    """Recurrent all-pairs flow. ``small=True`` = reference ``SmallRAFT``
    (hidden 96 / context 64 / radius 3), else ``RAFT`` (128/128/radius 4).

    ``__call__(image1, image2)`` with images in [0, 1] NHWC; returns the list
    of per-iteration upsampled flows (last one is the output), like the
    reference forward (``raft.py:68-119``).
    """

    small: bool = True
    iters: int = 12
    corr_levels: int = 4
    dtype: Any = jnp.float32
    memory_efficient: bool = False

    @property
    def corr_radius(self) -> int:
        return 3 if self.small else 4

    @nn.compact
    def __call__(self, image1, image2, train: bool = False):
        hdim = 96 if self.small else 128
        cdim = 64 if self.small else 128
        radius = self.corr_radius
        corr_planes = self.corr_levels * (2 * radius + 1) ** 2

        image1 = 2.0 * image1 - 1.0
        image2 = 2.0 * image2 - 1.0

        fnet = Encoder(
            output_dim=128 if self.small else 256,
            norm_fn="instance",
            small=self.small,
            dtype=self.dtype,
            name="fnet",
        )
        cnet = Encoder(
            output_dim=hdim + cdim,
            norm_fn="none" if self.small else "batch",
            small=self.small,
            dtype=self.dtype,
            name="cnet",
        )
        # One batched encoder pass over both frames.
        fmaps = fnet(jnp.concatenate([image1, image2], axis=0), train)
        fmap1, fmap2 = jnp.split(fmaps.astype(jnp.float32), 2, axis=0)

        pyramid = build_corr_pyramid(
            fmap1, fmap2, self.corr_levels,
            memory_efficient=self.memory_efficient,
        )

        ctx = cnet(image1, train)
        net = nn.tanh(ctx[..., :hdim])
        inp = nn.relu(ctx[..., hdim:])

        B, H8, W8, _ = fmap1.shape
        coords0 = coords_grid(B, H8, W8)
        coords1 = coords_grid(B, H8, W8)

        # Weight-tied recurrent refinement as a single lax.scan body
        # (parameters broadcast across iterations, per-iteration upsampled
        # flows stacked on axis 0).
        loop = nn.scan(
            _UpdateLoopBody,
            variable_broadcast="params",
            split_rngs={"params": False},
            in_axes=(nn.broadcast, nn.broadcast, nn.broadcast),
            out_axes=0,
            length=self.iters,
        )(
            self.small, corr_planes, hdim, radius, self.dtype, name="refine"
        )
        (net, coords1), flows = loop((net, coords1), pyramid, coords0, inp)
        # List of per-iteration flows, last = output (reference raft.py:104-119).
        return [flows[i] for i in range(self.iters)]


def SmallRAFT(**kwargs) -> RAFT:
    return RAFT(small=True, **kwargs)


def BasicRAFT(**kwargs) -> RAFT:
    return RAFT(small=False, **kwargs)
