"""Reacher task tests (env/reacher.py, BASELINE.md config 1): target
randomization inside the slide-joint ranges, PID reach via IK to within
the success radius, and the batched rollout path."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import ref_scene

from mujoco_rl_ur5_tpu.env.reacher import (
    ARM_HOME, SUCCESS_RADIUS, ReacherEnv,
)
from mujoco_rl_ur5_tpu.scene import load_model


@pytest.fixture(scope="module")
def env():
    return ReacherEnv(load_model(ref_scene("UR5gripper_reacher.xml")),
                      frame_skip=5)


@pytest.fixture(scope="module")
def es0(env):
    return jax.jit(env.reset)(jax.random.PRNGKey(0))


def test_reset_target_inside_ranges(env, es0):
    """Targets sample inside the scene's slide ranges. The slide joints
    carry `ref` offsets (.1/-.1/-.1, reacher.xml:261-263), so the world
    envelope is body_pos + (range - ref):
    x in [-.27,.27], y in [-.7,-.3], z in [.95,1.25]."""
    for seed in range(5):
        es = jax.jit(env.reset)(jax.random.PRNGKey(seed))
        t = np.asarray(es.target)
        assert -0.28 <= t[0] <= 0.28
        assert -0.71 <= t[1] <= -0.29
        assert 0.94 <= t[2] <= 1.26
    # arm starts at home
    np.testing.assert_allclose(
        np.asarray(es0.sim.qpos[env.arm_qadr]), ARM_HOME, atol=1e-6)


def test_observe_shape(env, es0):
    obs = env.observe(es0)
    assert obs.shape == (18,)
    np.testing.assert_allclose(np.asarray(obs[12:15]),
                               np.asarray(es0.target), atol=1e-6)


def test_step_moves_toward_setpoint(env, es0):
    """Commanding a setpoint rotates the joints toward it within a few
    frames and reward = -distance (+bonus)."""
    a = jnp.asarray([0.5, -1.2, 1.2, -1.57, -1.57, 0.0], jnp.float32)
    es = es0
    step = jax.jit(env.step)
    d0 = abs(float(es.sim.qpos[env.arm_qadr[0]]) - 0.5)
    for _ in range(20):
        es, r, done, info = step(es, a)
    d1 = abs(float(es.sim.qpos[env.arm_qadr[0]]) - 0.5)
    assert d1 < d0
    assert float(r) == pytest.approx(
        -float(info["dist"]) + (1.0 if bool(info["success"]) else 0.0),
        abs=1e-5)


def test_reach_ik_converges(env, es0):
    """The BASELINE config-1 workload: IK + PID reach, H=500 contact-free
    steps, final grasp-center-to-target distance < 5 cm."""
    es, info = jax.jit(lambda e: env.reach_ik(e, max_steps=500))(es0)
    assert bool(info["ik_ok"])
    assert bool(info["converged"])
    # joint tolerance 0.05 rad maps to <~8 cm EE error on this chain
    assert float(info["dist"]) < 0.08, float(info["dist"])


def test_reach_ik_batched(env):
    """vmapped reach over 4 random targets — every IK solves and distances
    shrink far below the home-pose distance."""
    keys = jax.random.split(jax.random.PRNGKey(7), 4)
    es = jax.jit(jax.vmap(env.reset))(keys)
    d0 = np.linalg.norm(
        np.asarray(jax.vmap(lambda e: env.ee_pos(e.sim.qpos))(es)
                   - es.target), axis=-1)
    es2, info = jax.jit(jax.vmap(lambda e: env.reach_ik(e, max_steps=500)))(es)
    d1 = np.asarray(info["dist"])
    assert np.asarray(info["ik_ok"]).all()
    assert (d1 < 0.1).all(), d1
    assert (d1 < d0).all()
