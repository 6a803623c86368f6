"""dvs_visualizer: ament wrapper around deep_visual_slam_tpu.ros2."""
