"""Ament-python packaging for the deep_visual_slam_tpu ROS2 visualizer.

Parity target: reference ``ros2_ws/src/vo_visualizer/setup.py:10-19`` —
resource index + package.xml/config.yaml data files + weights payload +
console entry point. Weights here are orbax/npz pytrees (``*.npz``) instead
of torch ``.pth``; the node's ``depth_weights``/``pose_weights`` ROS
parameters point at them.

Build inside a ROS2 workspace:  colcon build --packages-select dvs_visualizer
Run:  ros2 run dvs_visualizer visualizer_node \
          --ros-args -p depth_weights:=<share>/weights/depth.npz
"""

from glob import glob

from setuptools import find_packages, setup

package_name = "dvs_visualizer"

setup(
    name=package_name,
    version="0.1.0",
    packages=find_packages(exclude=["test"]),
    data_files=[
        # ament resource index
        (
            "share/ament_index/resource_index/packages",
            ["resource/" + package_name],
        ),
        # package manifest + default node config
        ("share/" + package_name, ["package.xml", "config.yaml"]),
        # converted model weights (npz pytrees), if present at build time
        ("share/" + package_name + "/weights", glob("weights/*.npz")),
    ],
    install_requires=["setuptools", "numpy"],
    zip_safe=True,
    maintainer="deep_visual_slam_tpu",
    maintainer_email="dev@example.com",
    description="VO point-cloud + TF visualizer on the JAX/TPU networks",
    license="MIT",
    tests_require=["pytest"],
    entry_points={
        "console_scripts": [
            "visualizer_node = dvs_visualizer.visualizer_node:main",
        ],
    },
)
