"""Low-level math ops: quaternions, rotations, spatial (6D) algebra, Pallas kernels."""

from mujoco_rl_ur5_tpu.ops import spatial  # noqa: F401
