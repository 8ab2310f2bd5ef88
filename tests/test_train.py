"""Smoke test of the online training loop (learn/train.py): the end-to-end
path the reference's `Grasping_Agent_multidiscrete.main()` (:515-583)
provides — episodes of reset -> eps_greedy -> env.step -> push -> learn ->
checkpoint — on a tiny config that compiles and runs in CI time."""

import dataclasses

import numpy as np
import pytest

from tests.conftest import ref_scene

from mujoco_rl_ur5_tpu.utils.config import (
    Config, EnvConfig, SceneConfig, SolverConfig, TrainConfig,
)
from mujoco_rl_ur5_tpu.learn.agent import AgentConfig


@pytest.fixture(scope="module")
def tiny_cfg(tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("ckpt"))
    return Config(
        scene=SceneConfig(path=ref_scene(
            "UR5gripper_2_finger_many_objects.xml")),
        solver=SolverConfig(ncon=96, iterations=10),
        env=EnvConfig(image_width=24, image_height=24, budget_scale=0.01),
        agent=AgentConfig(width=24, height=24, memory_size=32, batch_size=4,
                          dtype="float32"),
        train=TrainConfig(episodes=1, steps_per_episode=2, batch_envs=2,
                          seed=3, save_every_episodes=1,
                          checkpoint_dir=ckpt, logdir=None),
    )


def test_trainer_end_to_end(tiny_cfg):
    from mujoco_rl_ur5_tpu.learn.train import Trainer

    tr = Trainer(tiny_cfg)
    # agent config derived from the env (camera height -> depth clip)
    assert tr.agent.cfg.cam_z == pytest.approx(2.0)
    assert tr.agent.cfg.depth_clip == pytest.approx(1.1)
    ts, buf = tr.run(verbose=False)
    # 1 episode x 2 steps x 2 envs = 4 global steps and 4 banked transitions
    assert int(ts.step) == 4
    assert int(buf.size) == 4
    assert np.isfinite(np.asarray(buf.rewards[:4])).all()
    # rolling metric windows were fed
    assert len(tr.tracker.last_1000_rewards) == 4

    # checkpoint written; resuming restores the global step and replay
    import os

    final = os.path.join(tiny_cfg.train.checkpoint_dir, "final")
    assert os.path.exists(final)
    tr2 = Trainer(tiny_cfg)
    ts2 = tr2.agent.init(__import__("jax").random.PRNGKey(0))
    buf2 = tr2.agent.memory.init()
    ts2, buf2 = tr2.agent.restore(final, ts2, buf2)
    assert int(ts2.step) == 4
    assert int(buf2.size) == 4
