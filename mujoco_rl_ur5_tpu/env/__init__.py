"""Environments: the batched functional core (`GraspEnv`, `ReacherEnv`) and
the Gymnasium-compatible single-env wrapper (`GrasperEnv`, registered as
"mujoco_rl_ur5_tpu/Grasper-v0" — the TPU analogue of gym_grasper's
"Grasper-v0", gym_grasper/__init__.py:4-7)."""

from mujoco_rl_ur5_tpu.env.grasp_env import EnvState, GraspEnv

__all__ = ["EnvState", "GraspEnv", "GrasperEnv", "ReacherEnv",
           "register_envs"]


def __getattr__(name):
    # gymnasium / reacher imports stay lazy so the batched core does not
    # drag them in
    if name in ("GrasperEnv", "register_envs"):
        from mujoco_rl_ur5_tpu.env import gym_wrapper

        return getattr(gym_wrapper, name)
    if name == "ReacherEnv":
        from mujoco_rl_ur5_tpu.env.reacher import ReacherEnv

        return ReacherEnv
    raise AttributeError(name)
