"""deep_visual_slam_tpu — a TPU-native (JAX/XLA/Pallas/pjit) monocular
visual-SLAM / visual-odometry framework.

Capability-parity rebuild of chansoopark98/Deep-Visual-SLAM, re-designed
TPU-first:

- NHWC layouts, bf16 compute / fp32 params, static shapes, everything jitted.
- The reference's C++ g2o bundle-adjustment backend is replaced by a batched
  fixed-shape Levenberg–Marquardt solver written in pure `jax.lax`.
- Multi-chip scaling via `jax.sharding.Mesh` + collectives (no NCCL/MPI).

Subpackages
-----------
ops       Differentiable geometry + photometric losses (se3, camera, warp,
          ssim, smoothness, depth metrics) and Pallas TPU kernels.
models    Flax model zoo: ResNet encoder, DepthNet, PoseNet, RAFT, FlowPoseNet.
data      Host-side data pipeline (Redwood / NYU / custom / synthetic) with
          device prefetch.
training  Self-supervised VO trainer and supervised depth trainer.
parallel  Device-mesh / sharding / collectives layer.
slam      ORB frontend + keyframe map + windowed photometric BA (JAX LM).
eval      Trajectory + depth evaluation harnesses (ATE / RPE / Umeyama /
          KITTI-style segment errors).
utils     Config, checkpointing (orbax), logging, export, visualization.
"""

__version__ = "0.1.0"
