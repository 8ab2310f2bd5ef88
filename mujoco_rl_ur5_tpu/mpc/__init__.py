"""mpc/ — TPU-native trajectory-optimization engine (SURVEY.md §7.7).

The reference's planner layer is ikpy IK + serial tolerance-`while` PID
loops (gym_grasper/controller/MujocoController.py:269-517). This package
replaces it with batched iLQR over the compiled dynamics:

  * `lqr`       — time-varying LQT backward passes: classic sequential
                  Riccati (lax.scan) and the parallel-in-time
                  associative-scan formulation (O(log H) depth);
  * `ilqr`      — fixed-iteration iLQR with vmapped linearization and a
                  parallel line search, jit/vmap-safe end to end;
  * `pallas_ilqr` — the same algorithm restructured around the fused
                  Pallas chain kernels (physics/pallas_chain.py): one
                  kernel launch per rollout / linearization / line search
                  instead of thousands of micro-kernels;
  * `grasp_mpc` — `GraspMPC`: the UR5 grasp planner bound to an arm
                  submodel (scene/reduce.py), with reach + tracking costs;
                  batched solves auto-route through pallas_ilqr on TPU;
  * `policy`    — `MPCGraspPolicy`: executes the plans on the full contact
                  scene (TVLQR arm feedback + reference gripper PID) — the
                  closed loop that replaces the reference's scripted pick.
"""

from mujoco_rl_ur5_tpu.mpc.lqr import (
    LQR, Gains, backward_sequential, backward_parallel, rollout_policy,
)
from mujoco_rl_ur5_tpu.mpc.ilqr import ILQRResult, ilqr
from mujoco_rl_ur5_tpu.mpc.pallas_ilqr import ilqr_chain_batch
from mujoco_rl_ur5_tpu.mpc.grasp_mpc import GraspMPC, MPCWeights
from mujoco_rl_ur5_tpu.mpc.policy import MPCGraspPolicy, PickResult

__all__ = [
    "LQR", "Gains", "backward_sequential", "backward_parallel",
    "rollout_policy", "ILQRResult", "ilqr", "ilqr_chain_batch",
    "GraspMPC", "MPCWeights", "MPCGraspPolicy", "PickResult",
]
