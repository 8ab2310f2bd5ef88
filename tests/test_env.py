"""End-to-end tests for the batched GraspEnv phase machine.

Gates the env against the reference script (gym_grasper/envs/GraspingEnv.py):
reset randomization parity (:409-477), the action-decode + skip gate
(:94-131), and the full masked pick-&-place phase machine (:205-386) — run
at a reduced ``budget_scale`` so the complete program structure (every phase,
every fallback mask) executes in CI time.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import ref_scene

from mujoco_rl_ur5_tpu.env import GraspEnv
from mujoco_rl_ur5_tpu.env.grasp_env import HOME, TABLE_HEIGHT
from mujoco_rl_ur5_tpu.scene import load_model

SCENE = ref_scene("UR5gripper_2_finger_many_objects.xml")


@pytest.fixture(scope="module")
def model():
    return load_model(SCENE)


@pytest.fixture(scope="module")
def env(model):
    # tiny budgets + small images: exercises the full program structure
    return GraspEnv(model, ncon=96, iterations=15, image_width=32,
                    image_height=32, budget_scale=0.02)


@pytest.fixture(scope="module")
def es0(env):
    return jax.jit(env.reset)(jax.random.PRNGKey(0))


# -- reset parity (GraspingEnv.py:409-477) ------------------------------------


def test_reset_home_pose_and_object_ranges(env, es0):
    qpos = np.asarray(es0.sim.qpos)
    # actuated joints near home after the settle (PID holds them there)
    np.testing.assert_allclose(qpos[np.asarray(env.ctl.act_qadr)], HOME,
                               atol=0.3)
    # objects stay inside the pile randomization envelope (they only fall)
    qa = env.free_qadr
    assert env.nobj == 40
    x, y, z = qpos[qa], qpos[qa + 1], qpos[qa + 2]
    assert (np.abs(x) < 0.6).all()
    assert ((y > -1.1) & (y < 0.0)).all()
    assert ((z > 0.2) & (z < 1.55)).all()
    # quaternions stay unit-norm through settling
    quats = np.stack([qpos[qa + 3 + k] for k in range(4)], -1)
    np.testing.assert_allclose(np.linalg.norm(quats, axis=-1), 1.0, atol=1e-3)


def test_reset_randomization_differs_by_seed(env, es0):
    es1 = jax.jit(env.reset)(jax.random.PRNGKey(1))
    qa = env.free_qadr
    d = np.abs(np.asarray(es0.sim.qpos[qa]) - np.asarray(es1.sim.qpos[qa]))
    assert d.max() > 0.01, "object x-positions identical across seeds"


def test_reset_observation_sane(env, es0):
    assert es0.rgb.shape == (32, 32, 3) and es0.rgb.dtype == jnp.uint8
    assert es0.depth.shape == (32, 32)
    d = np.asarray(es0.depth)
    assert np.isfinite(d).all()
    # top_down camera at z=2.0: table surface ~1.09 m away, nothing closer
    # than the robot (~0.5 m) or farther than the floor (~2.0 m)
    assert d.min() > 0.2 and d.max() <= 2.1


# -- action decoding + skip gate (GraspingEnv.py:94-131) ----------------------


def test_decode_action_pixel_to_world(env, es0):
    a = jnp.asarray([5 * 32 + 7, 2], jnp.int32)        # pixel (x=7, y=5)
    coords, rot = env.decode_action(es0, a)
    assert int(rot) == 2
    # decoded world point lies in the workspace half-space the camera views
    c = np.asarray(coords)
    assert np.isfinite(c).all()
    assert c[2] < 2.0  # below the camera


def test_skip_gate_leaves_state_untouched(env, es0):
    """world z < 0.8 or y > -0.3 -> reward 0 and NO motion (:124-131)."""
    d = np.asarray(es0.depth)
    far = np.argwhere(2.0 - d < 0.75)     # world z < 0.75 < 0.8
    if len(far) == 0:
        pytest.skip("no below-table pixel in this render")
    y, x = far[0]
    a = jnp.asarray([int(y) * 32 + int(x), 0], jnp.int32)
    es1, reward, done, info = jax.jit(env.step)(es0, a)
    assert float(reward) == 0.0
    assert not bool(info["grasped"])
    np.testing.assert_array_equal(np.asarray(es1.sim.qpos),
                                  np.asarray(es0.sim.qpos))


# -- the full phase machine ----------------------------------------------------


def test_step_full_phase_machine(env, es0):
    """One full scripted pick-&-place at reduced budgets: must execute all
    phases, return finite state, a fresh observation, and a boolean reward."""
    d = np.asarray(es0.depth)
    # aim at the closest pixel (top of the pile) => on-table, not skipped
    y, x = np.unravel_index(np.argmin(d), d.shape)
    a = jnp.asarray([int(y) * 32 + int(x), 1], jnp.int32)
    es1, reward, done, info = jax.jit(env.step)(es0, a)
    assert float(reward) in (0.0, 1.0)
    assert not bool(done)
    assert np.isfinite(np.asarray(es1.sim.qpos)).all()
    assert np.isfinite(np.asarray(es1.sim.qvel)).all()
    # the arm moved (phase machine actually ran)
    moved = np.abs(np.asarray(es1.sim.qpos) - np.asarray(es0.sim.qpos))
    assert moved.max() > 1e-4
    # observation refreshed in place
    assert es1.depth.shape == es0.depth.shape


def test_step_vmap_batch(env):
    """Batched env: vmap(reset) + vmap(step) at B=4 — the TPU hot path."""
    B = 4
    keys = jax.random.split(jax.random.PRNGKey(42), B)
    es = jax.jit(jax.vmap(env.reset))(keys)
    assert es.sim.qpos.shape[0] == B
    d = np.asarray(es.depth)
    acts = []
    for b in range(B):
        y, x = np.unravel_index(np.argmin(d[b]), d[b].shape)
        acts.append([int(y) * 32 + int(x), b % 6])
    actions = jnp.asarray(acts, jnp.int32)
    es1, reward, done, info = jax.jit(jax.vmap(env.step))(es, actions)
    assert reward.shape == (B,)
    assert info["grasped"].shape == (B,)
    assert np.isfinite(np.asarray(es1.sim.qpos)).all()


def test_wrist_rotation_setpoint_applied(env, es0):
    """The rotation action must drive wrist_3 toward the commanded angle
    during the grasp (rotations {0,30,60,90,-30,-60} deg, GraspingEnv.py:40).
    At reduced budgets it won't converge, but the setpoint must persist."""
    d = np.asarray(es0.depth)
    y, x = np.unravel_index(np.argmin(d), d.shape)
    a = jnp.asarray([int(y) * 32 + int(x), 3], jnp.int32)   # 90 deg
    es1, *_ = jax.jit(env.step)(es0, a)
    # after the step the wrist is rotated BACK to 0 (phase 7), so check the
    # terminal setpoint is 0 and the controller state is finite
    assert float(es1.ctl.setpoints[5]) == pytest.approx(0.0)
    assert np.isfinite(np.asarray(es1.ctl.pid.integral)).all()
