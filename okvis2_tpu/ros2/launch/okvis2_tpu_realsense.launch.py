"""Launch the live realsense node (reference okvis_node_realsense)."""

from launch import LaunchDescription
from launch.actions import DeclareLaunchArgument
from launch.substitutions import LaunchConfiguration
from launch_ros.actions import Node


def generate_launch_description():
    config = LaunchConfiguration("config")
    return LaunchDescription([
        DeclareLaunchArgument("config"),
        Node(
            package="okvis2_tpu",
            executable="okvis2_tpu_realsense",
            name="okvis2_tpu_realsense",
            arguments=[config],
            output="screen",
        ),
    ])
