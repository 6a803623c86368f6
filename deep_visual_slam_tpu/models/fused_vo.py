"""Merged-stem VO inference: DepthNet + PoseNet sharing one stem dispatch.

The per-frame VO step runs DepthNet on the current frame and PoseNet on the
(current, previous) 6-channel pair — reference ``vo/predict.py:63-86`` runs
them back to back. At B=1 640x480 the two 7x7 stems dominate profiled device
time (396 + 196 us/frame) *plus* each forces a blocked-layout copy of its
small-channel input (147 + 287 us/frame): XLA lays the 3/6-channel input out
spatially-blocked per consuming conv.

Both networks normalize identically (``(x - 0.45) / 0.225``,
``models/resnet.py``), and the pose pair's first three channels ARE the depth
net's input, so the two stems merge exactly into ONE ``[7,7,6,128]`` conv
over the shared pair: the depth kernel zero-padded over the prev-frame
channels occupies outputs 0..63, the pose kernel outputs 64..127. One input
copy, one (latency-bound) conv; each encoder then resumes from its stem
BatchNorm via the ``stem_out`` injection point. Exact same math and
parameters as the separate applies (parity-tested).

(A streaming refinement was measured and rejected: carrying the pose stem's
previous-frame half across frames — by linearity, one [7,7,3,192] conv of
the current frame per step plus a carried [B,240,320,64] tensor — benches
346 vs 411 FPS: XLA's conv strategy for 3-channel inputs is ~2.5x slower
per output channel than the 6-channel form, and the 9.8 MB loop carry adds
relayouts, so splitting the pair conv loses more than the saved input
copy.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def make_fused_vo_apply(depth_model, pose_model, depth_on: str = "first"):
    """Returns ``apply(depth_vars, pose_vars, first, second) ->
    (disps, (axisangle, translation))`` — equal to
    ``depth_model.apply(dv, <depth frame>)`` +
    ``pose_model.apply(pv, concat([first, second]))`` with the two stems
    computed as one conv. ``first``/``second`` are [B, H, W, 3] float
    images in the pose pair's channel order; ``depth_on`` selects which of
    the two the depth net consumes ("first" for predict's
    (target, source) pairing, "second" for the SLAM loop's (prev, cur)).
    Inference only (``train=False``)."""
    if depth_on not in ("first", "second"):
        raise ValueError(f"depth_on must be 'first' or 'second': {depth_on}")
    if pose_model.dtype != depth_model.dtype:
        # The shared stem runs in one dtype; mixed-precision pairs would
        # silently change the pose stem's precision vs a separate apply.
        raise ValueError(
            "fused VO inference requires matching compute dtypes: "
            f"depth={depth_model.dtype}, pose={pose_model.dtype}"
        )
    dtype = depth_model.dtype

    def apply(depth_vars, pose_vars, first, second):
        # uint8 ingest (the SLAM loop's low-H2D path: 4x fewer bytes per
        # frame upload): scale to [0,1] here, at trace time on the static
        # dtype — XLA folds the /255 into the stem's input normalization.
        if first.dtype == jnp.uint8:
            first = first.astype(jnp.float32) / 255.0
        if second.dtype == jnp.uint8:
            second = second.astype(jnp.float32) / 255.0
        pair = jnp.concatenate([first, second], axis=-1)
        pairn = (pair.astype(dtype) - 0.45) / 0.225
        Wd = depth_vars["params"]["encoder"]["Conv_0"]["kernel"]
        Wp = pose_vars["params"]["encoder"]["Conv_0"]["kernel"]
        zeros = jnp.zeros_like(Wd)
        Wd6 = jnp.concatenate(
            [Wd, zeros] if depth_on == "first" else [zeros, Wd], axis=2
        )
        K6 = jnp.concatenate([Wd6, Wp], axis=-1)  # [7, 7, 6, 128]
        stem = jax.lax.conv_general_dilated(
            pairn,
            K6.astype(dtype),
            window_strides=(2, 2),
            padding=((3, 3), (3, 3)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        disps = depth_model.apply(
            depth_vars,
            first if depth_on == "first" else second,
            train=False,
            stem_out=stem[..., :64],
        )
        aa, t = pose_model.apply(
            pose_vars, pair, train=False, stem_out=stem[..., 64:]
        )
        return disps, (aa, t)

    return apply
