"""Console entry point shim: the node implementation lives in the library
package (``deep_visual_slam_tpu.ros2.visualizer_node``) so it is testable
headlessly; this module only re-exports it for the ament entry point."""

from deep_visual_slam_tpu.ros2.visualizer_node import (  # noqa: F401
    VisualizerNode,
    main,
)

if __name__ == "__main__":
    main()
