"""Model zoo shape/behavior tests (parity with reference architecture docs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deep_visual_slam_tpu.models import DepthNet, PoseNet, ResNetEncoder


H, W = 96, 128  # divisible by 32


def test_resnet18_encoder_feature_shapes(rng):
    enc = ResNetEncoder(num_layers=18)
    x = jnp.asarray(rng.uniform(size=(2, H, W, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert len(feats) == 5
    expect = [(2, H // 2, W // 2, 64), (2, H // 4, W // 4, 64),
              (2, H // 8, W // 8, 128), (2, H // 16, W // 16, 256),
              (2, H // 32, W // 32, 512)]
    assert [f.shape for f in feats] == expect
    assert enc.num_ch_enc == (64, 64, 128, 256, 512)


def test_resnet50_encoder_channels(rng):
    enc = ResNetEncoder(num_layers=50)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    variables = enc.init(jax.random.PRNGKey(0), x)
    feats = enc.apply(variables, x)
    assert [f.shape[-1] for f in feats] == [64, 256, 512, 1024, 2048]
    assert enc.num_ch_enc == (64, 256, 512, 1024, 2048)


def test_invalid_depth_raises(rng):
    enc = ResNetEncoder(num_layers=19)
    x = jnp.zeros((1, 64, 64, 3))
    with pytest.raises(ValueError):
        enc.init(jax.random.PRNGKey(0), x)


def test_depthnet_disp_scales(rng):
    net = DepthNet()
    x = jnp.asarray(rng.uniform(size=(2, H, W, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    out = net.apply(variables, x)
    assert set(out.keys()) == {("disp", i) for i in range(4)}
    for s in range(4):
        d = out[("disp", s)]
        assert d.shape == (2, H // 2**s, W // 2**s, 1)
        v = np.asarray(d)
        assert (v >= 0).all() and (v <= 1).all()  # sigmoid range


def test_depthnet_train_mode_updates_batch_stats(rng):
    net = DepthNet()
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)
    _, new_state = net.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )
    old = jax.tree_util.tree_leaves(variables["batch_stats"])
    new = jax.tree_util.tree_leaves(new_state["batch_stats"])
    assert any(
        not np.allclose(np.asarray(a), np.asarray(b)) for a, b in zip(old, new)
    )


def test_posenet_outputs(rng):
    net = PoseNet()
    pair = jnp.asarray(rng.uniform(size=(3, H, W, 6)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), pair)
    aa, t = net.apply(variables, pair)
    assert aa.shape == (3, 1, 1, 3)
    assert t.shape == (3, 1, 1, 3)
    # 0.01 scaling keeps initial outputs tiny.
    assert float(jnp.max(jnp.abs(aa))) < 0.1
    assert float(jnp.max(jnp.abs(t))) < 0.1


def test_depthnet_jit_and_bf16(rng):
    net = DepthNet(dtype=jnp.bfloat16)
    x = jnp.asarray(rng.uniform(size=(1, 64, 64, 3)).astype(np.float32))
    variables = net.init(jax.random.PRNGKey(0), x)

    @jax.jit
    def fwd(v, x):
        return net.apply(v, x)

    out = fwd(variables, x)
    # Disp heads cast back to fp32 for the loss.
    assert out[("disp", 0)].dtype == jnp.float32
    # Params stay fp32.
    leaf = jax.tree_util.tree_leaves(variables["params"])[0]
    assert leaf.dtype == jnp.float32


def test_depth_anything_v2_forward(rng):
    from deep_visual_slam_tpu.models import DepthAnythingV2
    from deep_visual_slam_tpu.models.depth_anything import VIT_CONFIGS

    m = DepthAnythingV2(encoder="vits", max_depth=20.0)
    x = jnp.asarray(rng.uniform(size=(1, 70, 84, 3)).astype(np.float32))
    v = jax.jit(m.init)(jax.random.PRNGKey(0), x)
    d = m.apply(v, x)
    assert d.shape == (1, 70, 84)
    vals = np.asarray(d)
    assert np.isfinite(vals).all()
    assert (vals > 0).all() and (vals < 20.0).all()  # sigmoid * max_depth
    # All four variants have configs with 4 tap layers.
    for name, cfg in VIT_CONFIGS.items():
        assert len(cfg["layers"]) == 4
        assert cfg["layers"][-1] == cfg["depth"] - 1


def test_two_encoder_posenet(rng):
    from deep_visual_slam_tpu.models.posenet import TwoEncoderPoseNet

    net = TwoEncoderPoseNet()
    pair = jnp.asarray(rng.uniform(size=(2, 64, 96, 6)).astype(np.float32))
    v = jax.jit(net.init)(jax.random.PRNGKey(0), pair)
    aa, t = net.apply(v, pair)
    assert aa.shape == (2, 1, 1, 3) and t.shape == (2, 1, 1, 3)
    # Shared encoder: params contain ONE encoder tree.
    assert "encoder" in v["params"] and "encoder_1" not in v["params"]


def test_plot_panels(rng):
    from deep_visual_slam_tpu.utils.plot import depth_panel, vo_panel

    H, W = 16, 24
    batch = {"target_image": rng.uniform(size=(1, H, W, 3)).astype(np.float32)}
    outputs = {
        "color_left_0": rng.uniform(size=(1, H, W, 3)).astype(np.float32),
        "color_right_0": rng.uniform(size=(1, H, W, 3)).astype(np.float32),
        "disp_0": rng.uniform(size=(1, H, W, 1)).astype(np.float32),
    }
    panel = vo_panel(batch, outputs)
    assert panel.shape == (H, 4 * W, 3) and panel.dtype == np.uint8
    dp = depth_panel(
        rng.uniform(size=(H, W, 3)), rng.uniform(1, 9, size=(H, W)),
        rng.uniform(1, 9, size=(H, W)),
    )
    assert dp.shape == (H, 3 * W, 3)
