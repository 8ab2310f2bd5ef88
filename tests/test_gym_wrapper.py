"""Gymnasium wrapper tests: registration + make, the 5-tuple step contract,
spaces (GraspingEnv.py:158-165), print_info, and markers — the reference's
public env API surface (gym_grasper/__init__.py:4-7, GraspingEnv.py:62)."""

import numpy as np
import pytest

import gymnasium

from tests.conftest import ref_scene


@pytest.fixture(scope="module")
def env():
    from mujoco_rl_ur5_tpu.env import register_envs

    register_envs()
    e = gymnasium.make(
        "mujoco_rl_ur5_tpu/Grasper-v0",
        file=ref_scene("UR5gripper_2_finger_many_objects.xml"),
        image_width=16, image_height=16, ncon=48, iterations=4,
        budget_scale=0.003)
    yield e
    e.close()


def test_registration_and_spaces(env):
    u = env.unwrapped
    assert env.action_space.shape == (2,)
    assert list(env.action_space.nvec) == [16 * 16, 6]
    assert env.observation_space["rgb"].shape == (16, 16, 3)
    assert env.observation_space["depth"].shape == (16, 16)
    assert u.TABLE_HEIGHT == 0.91


def test_reset_and_step_contract(env):
    obs, info = env.reset(seed=0)
    assert obs["rgb"].dtype == np.uint8 and obs["rgb"].shape == (16, 16, 3)
    assert np.isfinite(obs["depth"]).all()
    a = env.action_space.sample()
    obs2, reward, terminated, truncated, info = env.step(a)
    assert reward in (0.0, 1.0)
    assert terminated is False and truncated is False
    assert "grasped" in info
    assert env.unwrapped.current_observation is obs2


def test_reset_seeding_reproducible(env):
    o1, _ = env.reset(seed=7)
    o2, _ = env.reset(seed=7)
    np.testing.assert_array_equal(o1["rgb"], o2["rgb"])


def test_print_info_and_markers(env, capsys):
    env.reset(seed=1)
    u = env.unwrapped
    u.print_info()
    out = capsys.readouterr().out
    assert "Model timestep: 0.002" in out
    assert "Actionspace" in out

    u.add_marker([0.0, -0.6, 0.91], label="target")
    img = u.render_with_markers()
    assert img.shape == (16, 16, 3)
    # the marker crosshair recolors some pixels
    assert (img != np.asarray(u._es.rgb)).any()
    u.clear_markers()
    np.testing.assert_array_equal(u.render_with_markers(),
                                  np.asarray(u._es.rgb))
