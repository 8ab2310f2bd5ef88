"""Smooth-dynamics parity vs MuJoCo (contacts/limits/equality disabled).

Golden-style tests per SURVEY.md §4: FK, mass matrix, bias forces, and
integrated trajectories are compared against the real engine on the reference
scenes.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.physics import dynamics, fk
from mujoco_rl_ur5_tpu.scene import load_model, make_state
from tests.conftest import ref_scene

SCENE = "UR5gripper_2_finger_many_objects.xml"


def _disable_constraints(mm):
    mm.opt.disableflags |= (
        mujoco.mjtDisableBit.mjDSBL_CONTACT
        | mujoco.mjtDisableBit.mjDSBL_LIMIT
        | mujoco.mjtDisableBit.mjDSBL_EQUALITY
        | mujoco.mjtDisableBit.mjDSBL_FRICTIONLOSS
    )


@pytest.fixture(scope="module")
def setup(x64):
    """MuJoCo model with OUR compiled inertials copied in: isolates algorithm
    parity (CRBA/RNE/integrator) from the ~1e-3 legacy-mesh-constant noise."""
    path = ref_scene(SCENE)
    model = load_model(path, dtype=np.float64)
    mm = mujoco.MjModel.from_xml_path(path)
    mm.body_mass[:] = np.asarray(model.body_mass)
    mm.body_inertia[:] = np.asarray(model.body_inertia)
    mm.body_ipos[:] = np.asarray(model.body_ipos)
    mm.body_iquat[:] = np.asarray(model.body_iquat)
    mujoco.mj_setConst(mm, mujoco.MjData(mm))
    _disable_constraints(mm)
    dd = mujoco.MjData(mm)
    return model, mm, dd


def _rand_state(mm, dd, seed=0):
    rng = np.random.default_rng(seed)
    qpos = mm.qpos0.copy()
    qvel = 0.3 * rng.standard_normal(mm.nv)
    # arm hinges
    qpos[:8] = rng.uniform(-1.0, 1.0, 8)
    # perturb free joints with random quats
    for j in range(mm.njnt):
        if mm.jnt_type[j] == 0:  # free
            qa = mm.jnt_qposadr[j]
            qpos[qa : qa + 3] += rng.uniform(-0.1, 0.1, 3)
            q = rng.standard_normal(4)
            qpos[qa + 3 : qa + 7] = q / np.linalg.norm(q)
    dd.qpos[:] = qpos
    dd.qvel[:] = qvel
    return qpos, qvel


def test_fk_matches(setup):
    model, mm, dd = setup
    qpos, _ = _rand_state(mm, dd, seed=1)
    mujoco.mj_forward(mm, dd)
    kin = jax.jit(lambda q: fk(model, q))(jnp.asarray(qpos))
    np.testing.assert_allclose(np.asarray(kin.xpos), dd.xpos, atol=1e-9)
    xq = np.asarray(kin.xquat)
    for b in range(model.topo.nbody):
        assert (
            np.abs(xq[b] - dd.xquat[b]).max() < 1e-9
            or np.abs(xq[b] + dd.xquat[b]).max() < 1e-9
        ), model.topo.body_names[b]
    np.testing.assert_allclose(np.asarray(kin.xanchor), dd.xanchor, atol=1e-9)
    np.testing.assert_allclose(np.asarray(kin.xaxis), dd.xaxis, atol=1e-9)
    np.testing.assert_allclose(np.asarray(kin.xipos), dd.xipos, atol=1e-9)


def test_mass_matrix(setup):
    model, mm, dd = setup
    t = model.topo
    qpos, _ = _rand_state(mm, dd, seed=2)
    mujoco.mj_forward(mm, dd)
    M_ref = np.zeros((mm.nv, mm.nv))
    mujoco.mj_fullM(mm, dd, M_ref)

    kin = fk(model, jnp.asarray(qpos))
    cin = dynamics.com_inertia(model, kin)
    crb = dynamics.composite_inertia(model, cin)
    blocks = np.asarray(dynamics.mass_blocks(model, kin, crb))
    # reassemble dense
    M = np.zeros((t.nv, t.nv))
    for i in range(t.nv):
        for j in range(t.nv):
            if t.dof_tree[i] == t.dof_tree[j]:
                M[i, j] = blocks[t.dof_tree[i], t.dof_treeidx[i], t.dof_treeidx[j]]
    scale = np.abs(M_ref).max()
    assert np.abs(M - M_ref).max() / scale < 1e-9
    # cross-tree entries of the reference are exactly zero (sanity of blocking)
    off = M_ref.copy()
    for i in range(t.nv):
        same = t.dof_tree == t.dof_tree[i]
        off[i, same] = 0.0
    assert np.abs(off).max() == 0.0


def test_bias_forces(setup):
    model, mm, dd = setup
    qpos, qvel = _rand_state(mm, dd, seed=3)
    mujoco.mj_forward(mm, dd)
    kin = fk(model, jnp.asarray(qpos))
    cin = dynamics.com_inertia(model, kin)
    bias = np.asarray(dynamics.rne_bias(model, kin, cin, jnp.asarray(qvel)))
    scale = max(np.abs(dd.qfrc_bias).max(), 1.0)
    np.testing.assert_allclose(bias, dd.qfrc_bias, atol=1e-8 * scale, rtol=1e-6)


def test_trajectory_free_swing(setup):
    """200-step ctrl=0 rollout parity (arm swings under gravity, objects fall)."""
    model, mm, dd = setup
    mujoco.mj_resetData(mm, dd)
    state = make_state(model)

    stepper = jax.jit(lambda s: dynamics.step(model, s))
    for _ in range(200):
        mujoco.mj_step(mm, dd)
        state = stepper(state)
    qp = np.asarray(state.qpos)
    # positions: objects fall ballistically ~0.8 m; arm swings ~1 rad
    err = np.abs(qp - dd.qpos).max()
    assert err < 1e-6, err


def test_trajectory_actuated(setup):
    """Rollout with constant nonzero ctrl on all 7 motors."""
    model, mm, dd = setup
    mujoco.mj_resetData(mm, dd)
    ctrl = np.array([0.3, -0.5, 0.2, 0.1, -0.1, 0.05, 0.2])
    dd.ctrl[:] = ctrl
    state = make_state(model).replace(ctrl=jnp.asarray(ctrl))
    stepper = jax.jit(lambda s: dynamics.step(model, s))
    for _ in range(150):
        mujoco.mj_step(mm, dd)
        state = stepper(state)
    err = np.abs(np.asarray(state.qpos) - dd.qpos).max()
    assert err < 1e-6, err
