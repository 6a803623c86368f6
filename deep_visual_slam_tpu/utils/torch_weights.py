"""Torch -> Flax weight conversion for the ResNet encoder family.

The reference initializes its encoders from torchvision ImageNet weights
(``model/resnet_encoder.py:43-72``), including the multi-image first conv
trick: tile conv1 weights across the stacked frames and divide by the count
(``:66-67``). torchvision is not in this image, so conversion consumes a
torch ``state_dict`` (e.g. ``torch.load``-ed from a user-provided file) and
produces the Flax variables for ``models.resnet.ResNetEncoder``.

Layout notes: torch conv kernels are [O, I, kh, kw]; Flax NHWC wants
[kh, kw, I, O].
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

STAGES = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3), 50: (3, 4, 6, 3),
          101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def _k(w) -> np.ndarray:
    """torch conv weight -> flax kernel."""
    return np.asarray(w).transpose(2, 3, 1, 0)


def _bn(sd: Mapping, prefix: str):
    return (
        {"scale": np.asarray(sd[prefix + ".weight"]),
         "bias": np.asarray(sd[prefix + ".bias"])},
        {"mean": np.asarray(sd[prefix + ".running_mean"]),
         "var": np.asarray(sd[prefix + ".running_var"])},
    )


def convert_resnet_encoder(
    state_dict: Mapping[str, "np.ndarray"],
    num_layers: int = 18,
    num_input_images: int = 1,
) -> Dict:
    """torchvision-style ResNet ``state_dict`` -> Flax ResNetEncoder variables.

    Returns ``{"params": ..., "batch_stats": ...}`` matching the module tree
    of ``models.resnet.ResNetEncoder(num_layers, num_input_images)``.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    stages = STAGES[num_layers]
    bottleneck = num_layers > 34
    block_name = "BottleneckBlock" if bottleneck else "BasicBlock"

    params: Dict = {}
    stats: Dict = {}

    conv1 = _k(sd["conv1.weight"])
    if num_input_images > 1 and conv1.shape[2] == 3:
        # ImageNet-style 3-channel weights: tile input channels and
        # renormalize (reference ``:66-67``). Checkpoints trained with the
        # multi-image conv already store 3*N channels and pass through.
        conv1 = np.concatenate([conv1] * num_input_images, axis=2) / num_input_images
    params["Conv_0"] = {"kernel": conv1}
    p, s = _bn(sd, "bn1")
    params["BatchNorm_0"] = p
    stats["BatchNorm_0"] = s

    block_i = 0
    for stage_i, n_blocks in enumerate(stages):
        for b in range(n_blocks):
            t_pref = f"layer{stage_i + 1}.{b}"
            name = f"{block_name}_{block_i}"
            bp: Dict = {}
            bs: Dict = {}
            n_convs = 3 if bottleneck else 2
            for ci in range(n_convs):
                bp[f"Conv_{ci}"] = {"kernel": _k(sd[f"{t_pref}.conv{ci + 1}.weight"])}
                p, s = _bn(sd, f"{t_pref}.bn{ci + 1}")
                bp[f"BatchNorm_{ci}"] = p
                bs[f"BatchNorm_{ci}"] = s
            if f"{t_pref}.downsample.0.weight" in sd:
                bp[f"Conv_{n_convs}"] = {
                    "kernel": _k(sd[f"{t_pref}.downsample.0.weight"])
                }
                p, s = _bn(sd, f"{t_pref}.downsample.1")
                bp[f"BatchNorm_{n_convs}"] = p
                bs[f"BatchNorm_{n_convs}"] = s
            params[name] = bp
            stats[name] = bs
            block_i += 1

    return {"params": params, "batch_stats": stats}


def load_pretrained_encoder_into(variables: Dict, encoder_variables: Dict, path=("encoder",)) -> Dict:
    """Graft converted encoder variables into a larger model's variables
    (e.g. DepthNet/PoseNet with an ``encoder`` submodule)."""
    import copy

    out = copy.deepcopy(
        {"params": dict(variables["params"]),
         "batch_stats": dict(variables["batch_stats"])}
    )
    node_p = out["params"]
    node_s = out["batch_stats"]
    for key in path[:-1]:
        node_p = node_p[key]
        node_s = node_s[key]
    node_p[path[-1]] = encoder_variables["params"]
    node_s[path[-1]] = encoder_variables["batch_stats"]
    return out


def convert_depthnet(state_dict: Mapping, num_layers: int = 18) -> Dict:
    """Reference torch ``DepthNet`` state_dict -> Flax ``models.DepthNet``.

    Reference naming: the encoder lives under ``encoder.encoder.*``
    (ResnetEncoder wraps a torchvision resnet, ``model/resnet_encoder.py:93``)
    and the decoder is an ``nn.ModuleList`` over the OrderedDict values in
    construction order (``model/depthnet.py:43-60``):
    indices 0..9 = upconv(i, 0/1) for i = 4..0, 10..13 = dispconv(0..3).
    ConvBlock params sit at ``decoder.N.conv.conv.{weight,bias}``; Conv3x3
    (dispconv) at ``decoder.N.conv.{weight,bias}``.
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_sd = {
        k[len("encoder.encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.encoder.")
    }
    enc = convert_resnet_encoder(enc_sd, num_layers, 1)

    dec_params: Dict = {}
    idx = 0
    for i in range(4, -1, -1):
        for j in range(2):
            dec_params[f"upconv_{i}_{j}"] = {
                "ReflectConv3x3_0": {
                    "Conv_0": {
                        "kernel": _k(sd[f"decoder.{idx}.conv.conv.weight"]),
                        "bias": np.asarray(sd[f"decoder.{idx}.conv.conv.bias"]),
                    }
                }
            }
            idx += 1
    for s in range(4):
        dec_params[f"dispconv_{s}"] = {
            "Conv_0": {
                "kernel": _k(sd[f"decoder.{idx}.conv.weight"]),
                "bias": np.asarray(sd[f"decoder.{idx}.conv.bias"]),
            }
        }
        idx += 1

    return {
        "params": {"encoder": enc["params"], "decoder": dec_params},
        "batch_stats": {"encoder": enc["batch_stats"]},
    }


def convert_posenet(state_dict: Mapping, num_layers: int = 18) -> Dict:
    """Reference torch ``PoseNet`` state_dict -> Flax ``models.PoseNet``.

    Head naming: ``net.0`` = squeeze 1x1, ``net.1/2`` = 3x3 pose convs,
    ``net.3`` = final 1x1 (``model/posenet_single.py:165-172``).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_sd = {
        k[len("encoder.encoder."):]: v
        for k, v in sd.items()
        if k.startswith("encoder.encoder.")
    }
    enc = convert_resnet_encoder(enc_sd, num_layers, 2)

    def head(i):
        return {
            "kernel": _k(sd[f"net.{i}.weight"]),
            "bias": np.asarray(sd[f"net.{i}.bias"]),
        }

    params = {
        "encoder": enc["params"],
        "squeeze": head(0),
        "pose_0": head(1),
        "pose_1": head(2),
        "pose_2": head(3),
    }
    return {
        "params": params,
        "batch_stats": {"encoder": enc["batch_stats"]},
    }


def _conv_entry(sd: Mapping, prefix: str) -> Dict:
    """torch Conv2d ``{prefix}.weight/bias`` -> flax Conv params."""
    out = {"kernel": _k(sd[f"{prefix}.weight"])}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def convert_raft(state_dict: Mapping, small: bool = True) -> Dict:
    """Reference torch RAFT ``state_dict`` -> Flax ``models.RAFT`` variables.

    ``small=True`` is the variant the reference deploys (the frozen flow
    backbone of FlowPoseNet, ``model/posenet_single.py:91-147``): encoders
    ``fnet``/``cnet`` (SmallEncoder — instance/none norms carry no
    parameters) and ``update_block`` (SmallMotionEncoder, ConvGRU, FlowHead).
    ``small=False`` maps the Basic variant: ResidualBlock encoders (the
    batch-normed cnet contributes a ``batch_stats`` collection), the
    BasicMotionEncoder/SepConvGRU/FlowHead update block and the
    convex-upsampling mask head. Module paths match ``models/raft.py``
    (the scanned update block lives under ``refine/update``).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    # torch.nn.DataParallel checkpoints prefix with "module."
    sd = {
        (k[len("module."):] if k.startswith("module.") else k): v
        for k, v in sd.items()
    }

    stats: Dict = {}

    def encoder(prefix: str, batched: bool) -> Dict:
        """SmallEncoder (bottleneck) / BasicEncoder (residual) mapping.

        ``batched``: the Basic cnet uses BatchNorm (norm1/2/3 per block +
        the stem norm1); instance/none norms have no parameters.
        """
        enc: Dict = {"Conv_0": _conv_entry(sd, f"{prefix}.conv1")}
        enc_stats: Dict = {}
        if batched:
            p, s = _bn(sd, f"{prefix}.norm1")
            enc["_Norm_0"] = {"BatchNorm_0": p}
            enc_stats["_Norm_0"] = {"BatchNorm_0": s}
        block_name = "BottleneckBlock" if small else "ResidualBlock"
        n_convs = 3 if small else 2
        block_i = 0
        for layer in (1, 2, 3):
            for b in (0, 1):
                t = f"{prefix}.layer{layer}.{b}"
                blk: Dict = {}
                blk_stats: Dict = {}
                for ci in range(n_convs):
                    blk[f"Conv_{ci}"] = _conv_entry(sd, f"{t}.conv{ci + 1}")
                    if batched:
                        p, s = _bn(sd, f"{t}.norm{ci + 1}")
                        blk[f"_Norm_{ci}"] = {"BatchNorm_0": p}
                        blk_stats[f"_Norm_{ci}"] = {"BatchNorm_0": s}
                if f"{t}.downsample.0.weight" in sd:
                    blk[f"Conv_{n_convs}"] = _conv_entry(sd, f"{t}.downsample.0")
                    if batched:
                        p, s = _bn(sd, f"{t}.norm{n_convs + 1}")
                        blk[f"_Norm_{n_convs}"] = {"BatchNorm_0": p}
                        blk_stats[f"_Norm_{n_convs}"] = {"BatchNorm_0": s}
                enc[f"{block_name}_{block_i}"] = blk
                if blk_stats:
                    enc_stats[f"{block_name}_{block_i}"] = blk_stats
                block_i += 1
        enc["Conv_1"] = _conv_entry(sd, f"{prefix}.conv2")
        if enc_stats:
            stats[prefix] = enc_stats
        return enc

    if small:
        update = {
            "SmallMotionEncoder_0": {
                "Conv_0": _conv_entry(sd, "update_block.encoder.convc1"),
                "Conv_1": _conv_entry(sd, "update_block.encoder.convf1"),
                "Conv_2": _conv_entry(sd, "update_block.encoder.convf2"),
                "Conv_3": _conv_entry(sd, "update_block.encoder.conv"),
            },
            "ConvGRU_0": {
                "Conv_0": _conv_entry(sd, "update_block.gru.convz"),
                "Conv_1": _conv_entry(sd, "update_block.gru.convr"),
                "Conv_2": _conv_entry(sd, "update_block.gru.convq"),
            },
            "FlowHead_0": {
                "Conv_0": _conv_entry(sd, "update_block.flow_head.conv1"),
                "Conv_1": _conv_entry(sd, "update_block.flow_head.conv2"),
            },
        }
    else:
        update = {
            "BasicMotionEncoder_0": {
                "Conv_0": _conv_entry(sd, "update_block.encoder.convc1"),
                "Conv_1": _conv_entry(sd, "update_block.encoder.convc2"),
                "Conv_2": _conv_entry(sd, "update_block.encoder.convf1"),
                "Conv_3": _conv_entry(sd, "update_block.encoder.convf2"),
                "Conv_4": _conv_entry(sd, "update_block.encoder.conv"),
            },
            "SepConvGRU_0": {
                # torch: convz1/r1/q1 = (1,5) horizontal, convz2/r2/q2 = (5,1)
                "convz_h": _conv_entry(sd, "update_block.gru.convz1"),
                "convr_h": _conv_entry(sd, "update_block.gru.convr1"),
                "convq_h": _conv_entry(sd, "update_block.gru.convq1"),
                "convz_v": _conv_entry(sd, "update_block.gru.convz2"),
                "convr_v": _conv_entry(sd, "update_block.gru.convr2"),
                "convq_v": _conv_entry(sd, "update_block.gru.convq2"),
            },
            "FlowHead_0": {
                "Conv_0": _conv_entry(sd, "update_block.flow_head.conv1"),
                "Conv_1": _conv_entry(sd, "update_block.flow_head.conv2"),
            },
            # convex-upsampling mask head (update_block.mask.{0,2})
            "Conv_0": _conv_entry(sd, "update_block.mask.0"),
            "Conv_1": _conv_entry(sd, "update_block.mask.2"),
        }

    out: Dict = {
        "params": {
            "fnet": encoder("fnet", batched=False),
            "cnet": encoder("cnet", batched=not small),
            "refine": {"update": update},
        }
    }
    if stats:
        out["batch_stats"] = stats
    return out


def _dense(sd: Mapping, prefix: str) -> Dict:
    """torch Linear -> flax Dense (kernel transposed [in, out])."""
    out = {"kernel": np.asarray(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = np.asarray(sd[f"{prefix}.bias"])
    return out


def _layernorm(sd: Mapping, prefix: str) -> Dict:
    return {"scale": np.asarray(sd[f"{prefix}.weight"]),
            "bias": np.asarray(sd[f"{prefix}.bias"])}


def convert_depth_anything(state_dict: Mapping, encoder: str = "vits") -> Dict:
    """Reference Depth-Anything-V2 ``state_dict`` -> Flax
    ``models.DepthAnythingV2(encoder=...)``.

    Reference naming (``model/depth_anything_v2/dpt.py:152-182`` +
    ``dinov2.py``): backbone under ``pretrained.*`` (cls_token, pos_embed,
    patch_embed.proj, blocks.N.{norm1,attn.qkv,attn.proj,ls1,norm2,
    mlp.fc1,mlp.fc2,ls2}, norm), head under ``depth_head.*`` (projects.N,
    resize_layers.{0,1,3}, scratch.layerN_rn, scratch.refinenetN
    .resConfUnit{1,2}.conv{1,2} / .out_conv, scratch.output_conv1,
    scratch.output_conv2.{0,2}). ``pretrained.mask_token`` is unused at
    inference and dropped. refinenet4 is called without a skip input, so
    its (torch-present, never-executed) resConfUnit1 weights are dropped
    and resConfUnit2 maps to its single ResidualConvUnit.
    """
    from deep_visual_slam_tpu.models.depth_anything import VIT_CONFIGS

    cfg = VIT_CONFIGS[encoder]
    sd = {k: np.asarray(v) for k, v in state_dict.items()}

    def block(i: int) -> Dict:
        t = f"pretrained.blocks.{i}"
        return {
            "norm1": _layernorm(sd, f"{t}.norm1"),
            "attn": {
                "qkv": _dense(sd, f"{t}.attn.qkv"),
                "proj": _dense(sd, f"{t}.attn.proj"),
            },
            "ls1": {"gamma": np.asarray(sd[f"{t}.ls1.gamma"])},
            "norm2": _layernorm(sd, f"{t}.norm2"),
            "mlp_fc1": _dense(sd, f"{t}.mlp.fc1"),
            "mlp_fc2": _dense(sd, f"{t}.mlp.fc2"),
            "ls2": {"gamma": np.asarray(sd[f"{t}.ls2.gamma"])},
        }

    pretrained: Dict = {
        "cls_token": np.asarray(sd["pretrained.cls_token"]),
        "pos_embed": np.asarray(sd["pretrained.pos_embed"]),
        "patch_embed": _conv_entry(sd, "pretrained.patch_embed.proj"),
        "norm": _layernorm(sd, "pretrained.norm"),
    }
    for i in range(cfg["depth"]):
        pretrained[f"block_{i}"] = block(i)

    def rcu(prefix: str) -> Dict:
        return {
            "Conv_0": _conv_entry(sd, f"{prefix}.conv1"),
            "Conv_1": _conv_entry(sd, f"{prefix}.conv2"),
        }

    head: Dict = {}
    for i in range(4):
        head[f"project_{i}"] = _conv_entry(sd, f"depth_head.projects.{i}")
    for i in (0, 1):
        # ConvTranspose2d [in, out, kh, kw] -> flax transpose_kernel=True
        # layout [kh, kw, out, in].
        head[f"resize_{i}"] = {
            "kernel": np.asarray(
                sd[f"depth_head.resize_layers.{i}.weight"]
            ).transpose(2, 3, 1, 0),
            "bias": np.asarray(sd[f"depth_head.resize_layers.{i}.bias"]),
        }
    head["resize_3"] = _conv_entry(sd, "depth_head.resize_layers.3")
    for i in range(1, 5):
        head[f"layer{i}_rn"] = _conv_entry(
            sd, f"depth_head.scratch.layer{i}_rn"
        )
    for i in (1, 2, 3):
        t = f"depth_head.scratch.refinenet{i}"
        head[f"refinenet{i}"] = {
            "ResidualConvUnit_0": rcu(f"{t}.resConfUnit1"),
            "ResidualConvUnit_1": rcu(f"{t}.resConfUnit2"),
            "Conv_0": _conv_entry(sd, f"{t}.out_conv"),
        }
    head["refinenet4"] = {
        "ResidualConvUnit_0": rcu(
            "depth_head.scratch.refinenet4.resConfUnit2"
        ),
        "Conv_0": _conv_entry(sd, "depth_head.scratch.refinenet4.out_conv"),
    }
    head["output_conv1"] = _conv_entry(sd, "depth_head.scratch.output_conv1")
    head["output_conv2_0"] = _conv_entry(sd, "depth_head.scratch.output_conv2.0")
    head["output_conv2_2"] = _conv_entry(sd, "depth_head.scratch.output_conv2.2")

    return {"params": {"pretrained": pretrained, "depth_head": head}}


def strip_compile_prefix(state_dict: Mapping) -> Dict:
    """Remove torch.compile's ``_orig_mod.`` prefixes from checkpoint keys
    (reference ``vo/train.py:28-36`` / ``vo/utils/utils.py:13-21``), so
    compiled-model checkpoints convert cleanly."""
    return {
        (k[len("_orig_mod."):] if k.startswith("_orig_mod.") else k): v
        for k, v in state_dict.items()
    }
