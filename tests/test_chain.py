"""Parity gate for the unrolled chain dynamics (physics/chain.py) against
the generic tree pipeline (physics/dynamics.py) on the UR5 arm submodel.

chain.py is the MPC hot path (mpc/grasp_mpc.py rolls it thousands of times
per solve); this suite is the regression gate its docstring promises: any
edit to chain.py OR dynamics.py that diverges the two physics shows up here.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import ref_scene

from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.physics.chain import (
    chain_body_pos, chain_fk, chain_hold_ctrl, chain_step, make_chain_plan,
)
from mujoco_rl_ur5_tpu.physics.kinematics import fk
from mujoco_rl_ur5_tpu.scene.model import make_state
from mujoco_rl_ur5_tpu.scene.reduce import load_arm_model

SCENE = ref_scene("UR5gripper_2_finger_many_objects.xml")


@pytest.fixture(scope="module")
def arm(x64):
    # couple_equality=False: dynamics.step(ncon=0) skips equality rows, so
    # the exact-parity gate runs the chain without the coupling spring; the
    # coupled path is gated against ground-truth MuJoCo below
    # (test_equality_coupling_matches_mujoco).
    model = load_arm_model(SCENE, dtype=np.float64)
    return model, make_chain_plan(model, couple_equality=False)


def _rand_qvu(model, seed=0, qscale=0.4, vscale=0.5):
    rng = np.random.RandomState(seed)
    t = model.topo
    q = np.asarray(model.qpos0, np.float64) + qscale * rng.randn(t.nq)
    v = vscale * rng.randn(t.nv)
    u = rng.uniform(model.act_ctrlrange[:, 0], model.act_ctrlrange[:, 1])
    return jnp.asarray(q), jnp.asarray(v), jnp.asarray(u)


def test_chain_fk_matches_tree_fk(arm):
    model, plan = arm
    q, _, _ = _rand_qvu(model, seed=1)
    kin = fk(model, q)
    xpos, xrot, _, _ = chain_fk(plan, q)
    np.testing.assert_allclose(
        np.asarray(xpos), np.asarray(kin.xpos)[plan.body_ids], atol=1e-12)
    ee = model.topo.body_id("ee_link")
    np.testing.assert_allclose(
        np.asarray(chain_body_pos(plan, q, ee)),
        np.asarray(kin.xpos)[ee], atol=1e-12)


def test_chain_step_matches_dynamics_step(arm):
    """10 steps of chain_step == 10 steps of dynamics.step(ncon=0)."""
    model, plan = arm
    q, v, u = _rand_qvu(model, seed=2)
    state = make_state(model).replace(qpos=q, qvel=v, ctrl=u)
    qc, vc = q, v
    for _ in range(10):
        state = dynamics.step(model, state, ncon=0)
        qc, vc = chain_step(plan, qc, vc, u)
    np.testing.assert_allclose(np.asarray(qc), np.asarray(state.qpos),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(vc), np.asarray(state.qvel),
                               rtol=1e-8, atol=1e-9)


def test_chain_hold_ctrl_holds_arm(arm):
    """Gravity-compensation controls keep the arm nearly still at rest."""
    model, plan = arm
    q0 = jnp.asarray(np.asarray(model.qpos0, np.float64))
    u = chain_hold_ctrl(plan, q0)
    q, v = q0, jnp.zeros((model.topo.nv,), jnp.float64)
    for _ in range(50):
        q, v = chain_step(plan, q, v, u)
    assert float(jnp.max(jnp.abs(q - q0))) < 5e-3


def test_equality_coupling_matches_mujoco(arm):
    """With couple_equality=True the right knuckle mirrors the driven left
    knuckle like MuJoCo's finger-coupling equality (contact-free close:
    gripper_motor drives base_to_lik; base_to_rik follows only through the
    constraint — UR5gripper_2_finger_many_objects.xml:340)."""
    import mujoco

    model, _ = arm
    plan = make_chain_plan(model, couple_equality=True)
    assert len(plan.eq_d1) == 1

    mm = mujoco.MjModel.from_xml_path(SCENE)
    dd = mujoco.MjData(mm)
    t = model.topo
    names = t.joint_names
    mj_qadr = np.array([mm.jnt_qposadr[mujoco.mj_name2id(
        mm, mujoco.mjtObj.mjOBJ_JOINT, n)] for n in names])
    home = np.asarray(model.qpos0, np.float64)
    dd.qpos[mj_qadr] = home
    # park the pile far away (full scene has 40 free objects)
    for j in range(mm.njnt):
        if mm.jnt_type[j] == mujoco.mjtJoint.mjJNT_FREE:
            qa = mm.jnt_qposadr[j]
            dd.qpos[qa:qa + 3] = [40 + j, 40, 5.0]
            dd.qpos[qa + 3:qa + 7] = [1, 0, 0, 0]

    u = np.zeros(t.nu)
    u[:] = np.asarray(chain_hold_ctrl(plan, jnp.asarray(home)))
    # gentle close: a hard close (-0.6) drives the fingers into SELF-contact
    # (mujoco ncon=4 between the pads), which is outside this contact-free
    # gate; -0.03 stays clear and exercises the coupling quasi-statically
    u[-1] = -0.03
    q, v = jnp.asarray(home), jnp.zeros((t.nv,), jnp.float64)
    dd.ctrl[:] = u
    for _ in range(400):              # 800 ms
        mujoco.mj_step(mm, dd)
        q, v = chain_step(plan, q, v, jnp.asarray(u))
    assert dd.ncon == 0, "scenario must stay contact-free"
    q_my = np.asarray(q)
    q_mj = dd.qpos[mj_qadr]
    lik, rik = names.index("base_to_lik"), names.index("base_to_rik")
    # the coupling actually did something: rik moved substantially
    assert abs(q_mj[rik] - home[rik]) > 0.05
    # both knuckles land where MuJoCo puts them
    assert abs(q_my[lik] - q_mj[lik]) < 5e-3, (q_my[lik], q_mj[lik])
    assert abs(q_my[rik] - q_mj[rik]) < 5e-3, (q_my[rik], q_mj[rik])
    # and the constraint residual matches MuJoCo's softness to ~1e-3
    r_my = (q_my[rik] - home[rik]) - (q_my[lik] - home[lik])
    r_mj = (q_mj[rik] - home[rik]) - (q_mj[lik] - home[lik])
    assert abs(r_my - r_mj) < 1.5e-3, (r_my, r_mj)


def test_chain_ee_geom_matches_autodiff(arm):
    """The geometric EE Jacobians (z_d x (p - anchor_d), z_d x x_axis)
    equal jacfwd through the FK — the primitive behind GraspMPC's reach
    costs and Gauss-Newton quadratizations (mpc/grasp_mpc.ee_geom)."""
    from mujoco_rl_ur5_tpu.physics.chain import (
        chain_body_xaxis, chain_ee_geom,
    )

    model, plan = arm
    ee = model.topo.body_id("ee_link")
    for seed in (3, 4):
        q, _, _ = _rand_qvu(model, seed=seed)
        p, xa, Jp, Ja = chain_ee_geom(plan, q, ee)
        np.testing.assert_allclose(
            np.asarray(p), np.asarray(chain_body_pos(plan, q, ee)),
            atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(xa), np.asarray(chain_body_xaxis(plan, q, ee)),
            atol=1e-12)
        np.testing.assert_allclose(
            np.asarray(Jp),
            np.asarray(jax.jacfwd(
                lambda q: chain_body_pos(plan, q, ee))(q)),
            atol=1e-9)
        np.testing.assert_allclose(
            np.asarray(Ja),
            np.asarray(jax.jacfwd(
                lambda q: chain_body_xaxis(plan, q, ee))(q)),
            atol=1e-9)
