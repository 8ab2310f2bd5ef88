"""Physics layer: batched smooth dynamics + soft contact solver (pure JAX)."""

from mujoco_rl_ur5_tpu.physics.kinematics import Kin, fk  # noqa: F401
from mujoco_rl_ur5_tpu.physics.dynamics import step, forward  # noqa: F401
