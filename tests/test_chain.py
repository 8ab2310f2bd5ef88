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
    model = load_arm_model(SCENE, dtype=np.float64)
    return model, make_chain_plan(model)


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
