"""On-device analytic RGB-D renderer (the TPU-native replacement for the
reference's OpenGL offscreen render, MujocoController.py:708-727)."""

from mujoco_rl_ur5_tpu.render.camera import (
    Camera, make_camera, pixel_2_world, world_2_pixel,
)
from mujoco_rl_ur5_tpu.render.raycast import render_depth, render_rgbd

__all__ = [
    "Camera", "make_camera", "pixel_2_world", "world_2_pixel",
    "render_depth", "render_rgbd",
]
