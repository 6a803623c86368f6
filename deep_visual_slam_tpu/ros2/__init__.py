"""ROS2 integration (rclpy-gated)."""
