"""mujoco_rl_ur5_tpu — a TPU-native robot-grasping framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
PaulDanielML/MuJoCo_RL_UR5 (reference mounted read-only at /root/reference):
batched articulated-body physics, contact-rich grasping environments,
on-device RGB-D rendering, PID/IK control parity, an iLQR/SQP grasp-MPC
engine, and a Flax DQN learning stack — all designed SPMD-first for TPU
pod slices via `jax.sharding` meshes.

Layer map (mirrors SURVEY.md §1, re-architected TPU-first):

    L0 scene/     MJCF -> frozen pytree compiler (host, Python)
    L1 physics/   batched smooth dynamics + soft contacts (jnp + Pallas)
    L2 control/   vectorized PID, DLS-IK, joint-group semantics
    L2 render/    on-device pinhole RGB-D ray-caster
    L3 envs/      batched GraspEnv / Reacher + Gymnasium wrapper
    L4 mpc/       iLQR with associative-scan Riccati (the new engine)
    L4 learn/     Flax FCN Q-net, replay, DQN agent, offline pipeline
    --  parallel/ device-mesh shardings + collectives
    --  utils/    timers, configs, metrics writers
"""

__version__ = "0.1.0"
