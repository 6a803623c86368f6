"""Pretrained-weight bootstrap for the training path.

Reference behavior being matched:
  - encoders start from torchvision ImageNet weights when ``pretrained=True``
    (reference ``model/resnet_encoder.py:94-98``, multi-image conv1 tiling
    ``:66-67``);
  - the VO trainer loads full depth/pose model weights before training and
    strips torch.compile's ``_orig_mod.`` prefix
    (reference ``vo/train.py:83-98``).

There is no network egress and torchvision is not installed in this image, so
weights are consumed from user-provided files:

  - ``.pth`` / ``.pt``  — a torch ``state_dict`` (a full reference DepthNet /
    PoseNet, or a bare torchvision ResNet for the encoder); converted via
    :mod:`deep_visual_slam_tpu.utils.torch_weights` and cached as a sibling
    ``<name>.npz`` so torch is not needed on subsequent runs.
  - ``.npz`` — a cached flax variables pytree (flat ``collection/a/b/c`` keys)
    written by :func:`save_variables_npz`.

Config keys consumed (all under ``Train``, all optional / null by default):

.. code-block:: yaml

    Train:
      pretrained_encoder: weights/resnet18_imagenet.pth   # or .npz
      pretrained_weights:
        depth: weights/vo/depth_net_epoch_30.pth          # or .npz
        pose:  weights/vo/pose_net_epoch_30.pth
"""

from __future__ import annotations

import os
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import numpy as np

from deep_visual_slam_tpu.utils.torch_weights import (
    convert_depthnet,
    convert_posenet,
    convert_resnet_encoder,
    strip_compile_prefix,
)

_SEP = "/"


# ---------------------------------------------------------------------------
# npz (de)serialization of flax variables pytrees
# ---------------------------------------------------------------------------

def flatten_variables(variables: Mapping) -> Dict[str, np.ndarray]:
    """Nested variables dict -> flat ``{"a/b/c": array}`` (npz-friendly)."""
    flat: Dict[str, np.ndarray] = {}

    def walk(node, prefix):
        if isinstance(node, Mapping):
            for k, v in node.items():
                walk(v, prefix + [str(k)])
        else:
            flat[_SEP.join(prefix)] = np.asarray(node)

    walk(variables, [])
    return flat


def unflatten_variables(flat: Mapping[str, np.ndarray]) -> Dict:
    """Inverse of :func:`flatten_variables`."""
    out: Dict = {}
    for key, value in flat.items():
        node = out
        parts = key.split(_SEP)
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)
    return out


def save_variables_npz(path: str, variables: Mapping) -> None:
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    np.savez(path, **flatten_variables(variables))


def load_variables_npz(path: str) -> Dict:
    with np.load(path) as data:
        return unflatten_variables({k: data[k] for k in data.files})


# ---------------------------------------------------------------------------
# weight-file loading (torch state_dict or cached npz) with npz caching
# ---------------------------------------------------------------------------

def _load_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "state_dict" in sd and all(
        not hasattr(v, "shape") for k, v in sd.items() if k != "state_dict"
    ):
        sd = sd["state_dict"]
    sd = strip_compile_prefix(sd)
    return {k: np.asarray(v.detach().cpu() if hasattr(v, "detach") else v)
            for k, v in sd.items()}


def _cache_path(path: str) -> str:
    stem, _ = os.path.splitext(path)
    return stem + ".npz"


def _load_converted(path: str, convert_fn) -> Dict:
    """Load ``path`` as flax variables, converting + caching torch files.

    ``.npz`` loads directly; ``.pth/.pt`` goes through ``convert_fn`` and the
    result is cached as a sibling ``.npz`` (best-effort) so torch is only
    required the first time a given checkpoint is used.
    """
    if path.endswith(".npz"):
        return load_variables_npz(path)
    cache = _cache_path(path)
    if os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(path):
        return load_variables_npz(cache)
    variables = convert_fn(_load_state_dict(path))
    try:
        save_variables_npz(cache, variables)
    except OSError as e:  # read-only weight dirs are fine, just slower
        print(f"pretrained: could not cache {cache}: {e}")
    return variables


def load_depthnet_variables(path: str, num_layers: int = 18) -> Dict:
    """Full DepthNet weights (reference ``vo/train.py:83-87`` equivalent)."""
    return _load_converted(path, lambda sd: convert_depthnet(sd, num_layers))


def load_posenet_variables(path: str, num_layers: int = 18) -> Dict:
    """Full PoseNet weights (reference ``vo/train.py:95-98`` equivalent)."""
    return _load_converted(path, lambda sd: convert_posenet(sd, num_layers))


def load_raft_variables(path: str, small: bool = True) -> Dict:
    """Frozen SmallRAFT flow-backbone weights (reference FlowPoseNet wraps a
    pretrained SmallRAFT, ``model/posenet_single.py:91-147``)."""
    from deep_visual_slam_tpu.utils.torch_weights import convert_raft

    return _load_converted(path, lambda sd: convert_raft(sd, small))


def load_depth_anything_variables(path: str, encoder: str = "vits") -> Dict:
    """Published Depth-Anything-V2 checkpoint -> Flax variables."""
    from deep_visual_slam_tpu.utils.torch_weights import convert_depth_anything

    return _load_converted(
        path, lambda sd: convert_depth_anything(sd, encoder)
    )


def load_encoder_variables(
    path: str, num_input_images: int = 1, num_layers: int = 18
) -> Dict:
    """Bare ResNet (e.g. torchvision ImageNet) weights for the encoder.

    The multi-image conv1 tiling (reference ``model/resnet_encoder.py:66-67``)
    happens inside the converter; each ``num_input_images`` gets its own npz
    cache since the tiled conv1 differs.
    """
    if path.endswith(".npz"):
        return load_variables_npz(path)
    stem, _ = os.path.splitext(path)
    cache = f"{stem}.x{num_input_images}.npz"
    if os.path.exists(cache) and os.path.getmtime(cache) >= os.path.getmtime(path):
        return load_variables_npz(cache)
    variables = convert_resnet_encoder(
        _load_state_dict(path), num_layers, num_input_images
    )
    try:
        save_variables_npz(cache, variables)
    except OSError as e:
        print(f"pretrained: could not cache {cache}: {e}")
    return variables


# ---------------------------------------------------------------------------
# grafting into live training variables
# ---------------------------------------------------------------------------

def _check_compatible(new: Any, ref: Any, where: str) -> None:
    new_leaves = flatten_variables(new)
    ref_leaves = flatten_variables(ref)
    if set(new_leaves) != set(ref_leaves):
        missing = sorted(set(ref_leaves) - set(new_leaves))[:5]
        extra = sorted(set(new_leaves) - set(ref_leaves))[:5]
        raise ValueError(
            f"pretrained graft at '{where}' does not match the model tree "
            f"(missing {missing}, extra {extra}) — wrong num_layers or file?"
        )
    for k, v in new_leaves.items():
        if tuple(v.shape) != tuple(np.shape(ref_leaves[k])):
            raise ValueError(
                f"pretrained graft at '{where}/{k}': shape {v.shape} != "
                f"model shape {np.shape(ref_leaves[k])}"
            )


def _cast_like(new: Any, ref: Any) -> Any:
    """Cast loaded numpy leaves to the dtypes of the model's current leaves."""
    return jax.tree_util.tree_map(
        lambda n, r: np.asarray(n, dtype=np.asarray(r).dtype), new, ref
    )


def _graft(tree: Mapping, path: Tuple[str, ...], subtree: Any) -> Dict:
    """Return a copy of ``tree`` with ``subtree`` placed at ``path``."""
    tree = dict(tree)
    if len(path) == 1:
        tree[path[0]] = subtree
    else:
        tree[path[0]] = _graft(tree[path[0]], path[1:], subtree)
    return tree


def graft_variables(
    variables: Dict, loaded: Dict, path: Tuple[str, ...], where: str
) -> Dict:
    """Graft ``loaded`` ({"params", "batch_stats"}) into ``variables`` at
    ``path`` under both collections, shape-checked and dtype-matched."""
    out = dict(variables)
    for col in ("params", "batch_stats"):
        if col not in loaded or not loaded[col]:
            continue
        ref = variables[col]
        for p in path:
            ref = ref[p]
        _check_compatible(loaded[col], ref, f"{col}/{'/'.join(path)} ({where})")
        out[col] = _graft(out[col], path, _cast_like(loaded[col], ref))
    return out


def apply_vo_pretrained(
    variables: Dict, config: Dict
) -> Tuple[Dict, List[str]]:
    """Apply ``Train.pretrained_encoder`` / ``Train.pretrained_weights`` to
    freshly-initialized VO variables ({"params": {"depth","pose"}, ...}).

    Order mirrors the reference: ImageNet encoder init first
    (``model/resnet_encoder.py:94-98``), then full-model weights override it
    (``vo/train.py:83-98``).
    """
    t = config.get("Train", {})
    report: List[str] = []

    enc_path = t.get("pretrained_encoder")
    if enc_path:
        enc1 = load_encoder_variables(enc_path, num_input_images=1)
        variables = graft_variables(
            variables, enc1, ("depth", "encoder"), enc_path
        )
        enc2 = load_encoder_variables(enc_path, num_input_images=2)
        variables = graft_variables(
            variables, enc2, ("pose", "encoder"), enc_path
        )
        report.append(f"pretrained encoder (1x + 2x input): {enc_path}")

    pw = t.get("pretrained_weights") or {}
    if pw.get("depth"):
        loaded = load_depthnet_variables(pw["depth"])
        variables = graft_variables(variables, loaded, ("depth",), pw["depth"])
        report.append(f"pretrained depth net: {pw['depth']}")
    if pw.get("pose"):
        loaded = load_posenet_variables(pw["pose"])
        variables = graft_variables(variables, loaded, ("pose",), pw["pose"])
        report.append(f"pretrained pose net: {pw['pose']}")
    return variables, report


def apply_depth_pretrained(
    variables: Dict, config: Dict
) -> Tuple[Dict, List[str]]:
    """Same for the supervised-depth trainer ({"params": {"depth"}, ...})."""
    t = config.get("Train", {})
    report: List[str] = []
    enc_path = t.get("pretrained_encoder")
    if enc_path:
        enc = load_encoder_variables(enc_path, num_input_images=1)
        variables = graft_variables(
            variables, enc, ("depth", "encoder"), enc_path
        )
        report.append(f"pretrained encoder: {enc_path}")
    pw = t.get("pretrained_weights") or {}
    if pw.get("depth"):
        loaded = load_depthnet_variables(pw["depth"])
        variables = graft_variables(variables, loaded, ("depth",), pw["depth"])
        report.append(f"pretrained depth net: {pw['depth']}")
    return variables, report
