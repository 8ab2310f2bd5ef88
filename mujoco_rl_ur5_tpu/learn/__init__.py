"""L4 learning stack: Flax FCN Q-network, device-resident replay, the
shortsighted-DQN grasp agent, normalization stats, and the offline pipeline.

TPU-native re-design of the reference's torch/CUDA learning layer
(Modules.py, Grasping_Agent_multidiscrete.py, normalize.py, Offline RL/*).
"""

from mujoco_rl_ur5_tpu.learn.networks import (
    MultidiscreteResnet, multidiscrete_resnet, resnet, policy_resnet,
    count_parameters,
)
from mujoco_rl_ur5_tpu.learn.replay import ReplayBuffer
from mujoco_rl_ur5_tpu.learn.agent import GraspAgent, AgentConfig

__all__ = [
    "MultidiscreteResnet", "multidiscrete_resnet", "resnet", "policy_resnet",
    "count_parameters", "ReplayBuffer", "GraspAgent", "AgentConfig",
    "Trainer",
]


def __getattr__(name):
    # Trainer pulls in env/scene/utils; import lazily to keep `import
    # mujoco_rl_ur5_tpu.learn` light for pure-learning users.
    if name == "Trainer":
        from mujoco_rl_ur5_tpu.learn.train import Trainer

        return Trainer
    raise AttributeError(name)
