"""Pretrained-weight bootstrap: npz round-trip, .pth conversion+cache, and
the VERDICT-required proof that Trainer construction grafts converted
reference weights into the live training state (reference vo/train.py:83-98,
model/resnet_encoder.py:94-98)."""

import numpy as np
import torch
import torch.nn as nn

import jax

from deep_visual_slam_tpu.utils.config import load_config
from deep_visual_slam_tpu.utils.pretrained import (
    apply_vo_pretrained,
    flatten_variables,
    load_encoder_variables,
    load_variables_npz,
    save_variables_npz,
    unflatten_variables,
)

from test_torch_parity import TorchDepthNet, TorchResNet18, _torch_state_dict_resnet18


def test_npz_round_trip(tmp_path):
    variables = {
        "params": {"a": {"kernel": np.arange(6.0).reshape(2, 3)},
                   "b": {"bias": np.zeros(4, np.float32)}},
        "batch_stats": {"a": {"mean": np.ones(3)}},
    }
    path = str(tmp_path / "w.npz")
    save_variables_npz(path, variables)
    out = load_variables_npz(path)
    flat_in, flat_out = flatten_variables(variables), flatten_variables(out)
    assert set(flat_in) == set(flat_out)
    for k in flat_in:
        np.testing.assert_array_equal(flat_in[k], flat_out[k])
    # unflatten inverts flatten
    assert set(flatten_variables(unflatten_variables(flat_in))) == set(flat_in)


def test_encoder_pth_loads_and_caches(tmp_path):
    net = _torch_state_dict_resnet18()
    path = str(tmp_path / "resnet18.pth")
    torch.save(net.state_dict(), path)

    v1 = load_encoder_variables(path, num_input_images=2)
    # conv1 is tiled to 6 input channels and renormalized (ref :66-67).
    assert v1["params"]["Conv_0"]["kernel"].shape == (7, 7, 6, 64)
    cache = tmp_path / "resnet18.x2.npz"
    assert cache.exists()
    # Second load hits the cache (corrupt the .pth to prove it's unused;
    # bump the cache mtime so it stays fresh vs the rewritten .pth).
    with open(path, "wb") as f:
        f.write(b"not a torch file")
    import os
    os.utime(cache, None)
    v2 = load_encoder_variables(path, num_input_images=2)
    np.testing.assert_array_equal(
        v1["params"]["Conv_0"]["kernel"], v2["params"]["Conv_0"]["kernel"]
    )


def _vo_config(tmp_path, **train_overrides):
    return load_config(overrides={
        "Directory": {
            "exp_name": "pre",
            "data_dir": str(tmp_path / "data") + "/",
            "log_dir": str(tmp_path / "tb"),
            "weights": str(tmp_path / "weights"),
            "results": str(tmp_path / "results"),
        },
        "Dataset": {
            "redwood": {"mono": False},
            "synthetic": {"mono": True, "length": 16},
        },
        "Train": {
            "img_h": 64, "img_w": 96,
            "batch_size": 8, "epoch": 1,
            "num_workers": 0, "compute_dtype": "float32",
            **train_overrides,
        },
        "Experiment": {"num_devices": 8},
    })


def test_trainer_grafts_pretrained_encoder_and_full_weights(tmp_path):
    """After Trainer construction, encoder params == converted torch values
    and full DepthNet weights override the encoder graft."""
    from deep_visual_slam_tpu.training.vo_trainer import Trainer
    from deep_visual_slam_tpu.utils.torch_weights import convert_depthnet

    enc_net = _torch_state_dict_resnet18(seed=3)
    enc_path = str(tmp_path / "imagenet_resnet18.pth")
    torch.save(enc_net.state_dict(), enc_path)

    torch.manual_seed(4)
    depth_net = TorchDepthNet()
    for m in depth_net.modules():
        if isinstance(m, nn.BatchNorm2d):
            m.running_mean.uniform_(-0.2, 0.2)
            m.running_var.uniform_(0.5, 1.5)
    depth_path = str(tmp_path / "depth_net_epoch_30.pth")
    torch.save(depth_net.state_dict(), depth_path)

    cfg = _vo_config(
        tmp_path,
        pretrained_encoder=enc_path,
        pretrained_weights={"depth": depth_path, "pose": None},
    )
    trainer = Trainer(cfg)

    params = jax.device_get(trainer.state.params)
    stats = jax.device_get(trainer.state.batch_stats)

    # Depth: the FULL-model load wins over the encoder graft (ref order).
    expect = convert_depthnet(
        {k: v.detach().numpy() for k, v in depth_net.state_dict().items()}
    )
    got = flatten_variables(params["depth"])
    want = flatten_variables(expect["params"])
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-6, err_msg=k)
    got_s = flatten_variables(stats["depth"]["encoder"])
    want_s = flatten_variables(expect["batch_stats"]["encoder"])
    for k in want_s:
        np.testing.assert_allclose(got_s[k], want_s[k], atol=1e-6, err_msg=k)

    # Pose: encoder graft applied (2-image tiled conv1), head stays random.
    from deep_visual_slam_tpu.utils.torch_weights import convert_resnet_encoder

    enc2 = convert_resnet_encoder(
        {k: v.detach().numpy() for k, v in enc_net.state_dict().items()}, 18, 2
    )
    np.testing.assert_allclose(
        np.asarray(params["pose"]["encoder"]["Conv_0"]["kernel"]),
        enc2["params"]["Conv_0"]["kernel"],
        atol=1e-6,
    )

    # The optimizer was initialized over the grafted params (same tree).
    assert int(np.asarray(trainer.state.step)) == 0


def test_graft_shape_mismatch_raises(tmp_path):
    """Wrong-architecture weights fail loudly, not silently."""
    import pytest

    variables = {
        "params": {"depth": {"encoder": {"Conv_0": {"kernel": np.zeros((7, 7, 3, 64))}}},
                   "pose": {"encoder": {"Conv_0": {"kernel": np.zeros((7, 7, 6, 64))}}}},
        "batch_stats": {"depth": {"encoder": {}}, "pose": {"encoder": {}}},
    }
    bad = str(tmp_path / "bad.npz")
    save_variables_npz(bad, {"params": {"Conv_0": {"kernel": np.zeros((3, 3, 3, 8))}},
                             "batch_stats": {}})
    cfg = {"Train": {"pretrained_encoder": bad}}
    with pytest.raises(ValueError, match="shape|match"):
        apply_vo_pretrained(variables, cfg)
