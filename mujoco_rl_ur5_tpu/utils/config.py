"""Config tree for the whole framework.

The reference configures itself through three ad-hoc mechanisms
(SURVEY.md §5 "Config / flag system"): module-level UPPERCASE constants
(Grasping_Agent_multidiscrete.py:22-41), constructor kwargs
(GraspingEnv.py:28-36), and gym.make passthrough (:85-97). This module
replaces all three with one frozen dataclass tree that reaches every
subsystem: scene selection, solver budgets, env phase budgets, the training
loop, and the device mesh.

Everything here is static (hashable) so configs can parameterize jitted
closures without retrace surprises.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

from mujoco_rl_ur5_tpu.learn.agent import AgentConfig

REF_SCENES = "/root/reference/UR5+gripper"


@dataclasses.dataclass(frozen=True)
class SceneConfig:
    """Which MJCF to compile (reference: XML path kwarg, GraspingEnv.py:30)."""

    path: str = f"{REF_SCENES}/UR5gripper_2_finger_many_objects.xml"
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class SolverConfig:
    """Contact solver budgets. `iterations=None` follows the scene's
    <option iterations> (100 in the grasp scenes) — the parity default."""

    ncon: int = 128
    iterations: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class EnvConfig:
    """GraspEnv knobs (GraspingEnv.py:28-36 constructor kwargs)."""

    image_width: int = 200
    image_height: int = 200
    camera: str = "top_down"
    demo: bool = False
    budget_scale: float = 1.0


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop schedule (Grasping_Agent_multidiscrete.py:22-41,:515-583).

    `batch_envs` is the TPU extension: the loop drives that many scenarios
    in lockstep per env step (the reference is strictly batch_envs=1)."""

    episodes: int = 1000
    steps_per_episode: int = 50
    batch_envs: int = 1
    seed: int = 20
    save_every_episodes: int = 10
    checkpoint_dir: Optional[str] = None
    logdir: Optional[str] = None
    description: str = ""


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh shape (SURVEY.md §2.4): data x model axes."""

    data: int = -1      # -1: all devices on the data axis
    model: int = 1


@dataclasses.dataclass(frozen=True)
class Config:
    scene: SceneConfig = SceneConfig()
    solver: SolverConfig = SolverConfig()
    env: EnvConfig = EnvConfig()
    agent: AgentConfig = AgentConfig()
    train: TrainConfig = TrainConfig()
    mesh: MeshConfig = MeshConfig()

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)
