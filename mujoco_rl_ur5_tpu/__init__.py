"""mujoco_rl_ur5_tpu — a TPU-native robot-grasping framework.

A from-scratch JAX/XLA re-design of the capabilities of
PaulDanielML/MuJoCo_RL_UR5 (reference mounted read-only at /root/reference):
batched articulated-body physics, contact-rich grasping environments,
on-device RGB-D rendering, PID/IK control parity, an iLQR grasp-MPC
engine with a parallel-in-time Riccati pass, and a Flax DQN learning
stack — all designed SPMD-first for TPU pod slices via `jax.sharding`
meshes.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

    L0 scene/     MJCF -> frozen pytree compiler (host, Python)
    L1 physics/   batched smooth dynamics + soft contacts (APGD cones)
    L2 control/   vectorized PID, DLS-IK, joint groups, introspection
    L2 render/    on-device pinhole RGB-D ray-caster
    L3 env/       batched GraspEnv + Reacher + Gymnasium wrapper
    L4 mpc/       iLQR with associative-scan Riccati (the new engine)
    L4 learn/     Flax FCN Q-net, replay, DQN agent, training loop,
                  offline pipeline
    --  parallel/ device-mesh shardings, TP layouts, multi-host init
    --  utils/    timers/profilers, config tree, tensorboard metrics
"""

__version__ = "0.2.0"
