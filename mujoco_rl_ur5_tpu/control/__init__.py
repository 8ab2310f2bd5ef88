"""Control layer: vectorized PID, joint groups, motion primitives, batched IK.

TPU-native replacement for the reference's MJ_Controller
(/root/reference/gym_grasper/controller/MujocoController.py:21): per-joint
simple_pid loops become a fused 7-wide PID inside the jitted rollout step, the
tolerance-terminated ``while`` loops become fixed-horizon masked ``lax.scan``
rollouts, and ikpy's scipy least-squares becomes a batched damped-Gauss-Newton
IK over the compiled kinematic chain.
"""

from mujoco_rl_ur5_tpu.control.pid import (  # noqa: F401
    PIDParams, PIDState, pid_init, pid_output, reference_gains,
)
from mujoco_rl_ur5_tpu.control.controller import (  # noqa: F401
    Controller, CtrlState, MoveResult,
)
from mujoco_rl_ur5_tpu.control.ik import ik_solve  # noqa: F401
from mujoco_rl_ur5_tpu.control.introspect import (  # noqa: F401
    show_model_info, display_current_values, joint_angle_plot,
)
