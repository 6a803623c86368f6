"""ROS2 visualizer node: publishes VO point clouds + TF transforms.

Parity target: reference ``ros2_ws/src/vo_visualizer/vo_visualizer/
visualizer_node.py`` — an rclpy node that loads DepthNet + PoseNet, steps a
test loader on a timer, integrates the world pose, and publishes
``PointCloud2`` (RGB packed as float) plus a TF transform with quaternion
orientation.

Requires rclpy (not present in this image); the message-payload logic is
factored into ``msg_utils.py`` so it stays testable headlessly. Run inside a
ROS2 environment:

    ros2 run <pkg> visualizer_node  (or)  python -m deep_visual_slam_tpu.ros2.visualizer_node
"""

from __future__ import annotations

import numpy as np

try:
    import rclpy
    from rclpy.node import Node
    from sensor_msgs.msg import PointCloud2, PointField
    from geometry_msgs.msg import TransformStamped
    from tf2_ros import TransformBroadcaster

    HAS_RCLPY = True
except ImportError:  # headless image: importable, not runnable
    HAS_RCLPY = False
    Node = object

from deep_visual_slam_tpu.ros2.msg_utils import (
    pointcloud2_data,
    rotation_matrix_to_quaternion,
)


class VisualizerNode(Node):
    """Timer-driven VO inference + PointCloud2/TF publisher."""

    def __init__(self, config=None, data_root=None, period_s: float = 0.2):
        if not HAS_RCLPY:
            raise RuntimeError("rclpy is not available in this environment")
        super().__init__("vo_visualizer")

        import jax
        import jax.numpy as jnp

        from deep_visual_slam_tpu.data.loader import VoDataLoader
        from deep_visual_slam_tpu.models import DepthNet, PoseNet
        from deep_visual_slam_tpu.ops import (
            backproject,
            disp_to_depth,
            transformation_from_parameters,
        )
        from deep_visual_slam_tpu.training import init_vo_models
        from deep_visual_slam_tpu.utils.config import load_config

        # ROS2 parameters (settable via --ros-args -p name:=value or the
        # packaged config.yaml; reference parameterizes the weights path the
        # same way, ros2_ws/src/vo_visualizer setup data_files):
        #   config_file      YAML training config to load
        #   data_root        dataset root override
        #   depth_weights / pose_weights   .npz/.pth model weights
        self.declare_parameter("config_file", "")
        self.declare_parameter("data_root", "")
        self.declare_parameter("depth_weights", "")
        self.declare_parameter("pose_weights", "")
        cfg_file = self.get_parameter("config_file").value or None
        data_root = (
            data_root or self.get_parameter("data_root").value or None
        )

        self.config = config or load_config(cfg_file)
        t = self.config["Train"]
        H, W = t["img_h"], t["img_w"]

        depth_model = DepthNet()
        pose_model = PoseNet()
        variables = init_vo_models(
            depth_model, pose_model, (H, W), jax.random.PRNGKey(0)
        )
        dw = self.get_parameter("depth_weights").value
        pw = self.get_parameter("pose_weights").value
        if dw or pw:
            from deep_visual_slam_tpu.utils.pretrained import (
                apply_vo_pretrained,
            )

            cfg = dict(self.config)
            cfg["Train"] = dict(t)
            cfg["Train"]["pretrained_weights"] = {
                "depth": dw or None, "pose": pw or None,
            }
            variables, msgs = apply_vo_pretrained(variables, cfg)
            for m in msgs:
                self.get_logger().info(m)
        dv = {"params": variables["params"]["depth"],
              "batch_stats": variables["batch_stats"]["depth"]}
        pv = {"params": variables["params"]["pose"],
              "batch_stats": variables["batch_stats"]["pose"]}

        @jax.jit
        def step(target, right, inv_K):
            disps = depth_model.apply(dv, target, train=False)
            _, depth = disp_to_depth(
                disps[("disp", 0)], t["min_depth"], t["max_depth"]
            )
            pair = jnp.concatenate([target, right], axis=-1)
            aa, tr = pose_model.apply(pv, pair, train=False)
            T = transformation_from_parameters(aa[:, 0, 0], tr[:, 0, 0])
            pts = backproject(depth[..., 0], inv_K)
            return depth[..., 0], T, pts

        self._step = step
        loader = VoDataLoader(self.config, root_dir=data_root)
        self._iter = iter(loader.test_loader)
        self.world_T = np.eye(4)

        self.pc_pub = self.create_publisher(PointCloud2, "vo/pointcloud", 2)
        self.tf_broadcaster = TransformBroadcaster(self)
        self.timer = self.create_timer(period_s, self.on_timer)

    def on_timer(self):
        import jax.numpy as jnp

        try:
            batch = next(self._iter)
        except StopIteration:
            self.get_logger().info("sequence finished")
            return
        depth, T, pts = self._step(
            jnp.asarray(batch["target_image"]),
            jnp.asarray(batch["source_right"]),
            jnp.asarray(batch["inv_K"]),
        )
        self.world_T = self.world_T @ np.asarray(T[0], np.float64)
        self.publish_pointcloud(
            np.asarray(pts[0]), np.asarray(batch["target_image"][0])
        )
        self.publish_tf(self.world_T)

    def publish_pointcloud(self, points_cam, colors, stride: int = 4):
        pts = points_cam[::stride, ::stride].reshape(-1, 3)
        col = colors[::stride, ::stride].reshape(-1, 3)
        R, t = self.world_T[:3, :3], self.world_T[:3, 3]
        pts_w = pts @ R.T + t

        msg = PointCloud2()
        msg.header.stamp = self.get_clock().now().to_msg()
        msg.header.frame_id = "map"
        msg.height = 1
        msg.width = len(pts_w)
        msg.fields = [
            PointField(name=n, offset=4 * i, datatype=PointField.FLOAT32, count=1)
            for i, n in enumerate(("x", "y", "z", "rgb"))
        ]
        data, step = pointcloud2_data(pts_w, col)
        msg.point_step = step
        msg.row_step = step * msg.width
        msg.is_dense = True
        msg.data = data
        self.pc_pub.publish(msg)

    def publish_tf(self, world_T):
        msg = TransformStamped()
        msg.header.stamp = self.get_clock().now().to_msg()
        msg.header.frame_id = "map"
        msg.child_frame_id = "camera"
        msg.transform.translation.x = float(world_T[0, 3])
        msg.transform.translation.y = float(world_T[1, 3])
        msg.transform.translation.z = float(world_T[2, 3])
        q = rotation_matrix_to_quaternion(world_T[:3, :3])
        msg.transform.rotation.x = float(q[0])
        msg.transform.rotation.y = float(q[1])
        msg.transform.rotation.z = float(q[2])
        msg.transform.rotation.w = float(q[3])
        self.tf_broadcaster.sendTransform(msg)


def main(args=None):
    if not HAS_RCLPY:
        raise SystemExit("rclpy not available — run inside a ROS2 environment")
    rclpy.init(args=args)
    node = VisualizerNode()
    rclpy.spin(node)
    node.destroy_node()
    rclpy.shutdown()


if __name__ == "__main__":
    main()
