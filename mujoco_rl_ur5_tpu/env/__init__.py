"""Batched grasping environment (TPU re-design of gym_grasper.GraspEnv)."""

from mujoco_rl_ur5_tpu.env.grasp_env import EnvState, GraspEnv

__all__ = ["EnvState", "GraspEnv"]
