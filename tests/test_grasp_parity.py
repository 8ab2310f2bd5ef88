"""Contact-rich grasp-sequence parity vs MuJoCo (VERDICT round-1 weak #6:
the close/lift phases through contact were untested).

Drives the SAME time-varying setpoint schedule (pre-grasp -> descend ->
close -> lift, from our IK) through both engines with the same fixed-dt PID
law, at the scene's own solver budget, with one graspable ball under the
gripper. Gates: arm-joint trajectory MAE, gripper-joint MAE through contact,
finger-convergence (grasp) flag agreement, and lifted-object agreement.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.conftest import ref_scene

from mujoco_rl_ur5_tpu.control import Controller, reference_gains
from mujoco_rl_ur5_tpu.control.ik import ArmChain, ik_solve
from mujoco_rl_ur5_tpu.control.pid import pid_output
from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.scene import load_model, make_state
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_FREE

SCENE = "UR5gripper_2_finger_many_objects.xml"
HOME = np.array([0, -1.57, 1.57, -1.57, -1.57, 0, 0.3, 0.3])
BALL = np.array([0.0, -0.60, 0.935])      # object_0 (sphere r=0.025) on table
PHASES = [400, 200, 250, 300]             # pre-grasp, descend, close, lift


@pytest.fixture(scope="module")
def setup():
    model = load_model(ref_scene(SCENE))
    mm = mujoco.MjModel.from_xml_path(ref_scene(SCENE))
    t = model.topo
    qpos = np.asarray(model.qpos0).copy()
    qpos[:8] = HOME
    free = np.nonzero(t.jnt_type == JNT_FREE)[0]
    for k, j in enumerate(free):
        qa = t.jnt_qposadr[j]
        qpos[qa:qa + 3] = [40 + 2 * k, 40, 5.0]    # park the pile far away
        qpos[qa + 3:qa + 7] = [1, 0, 0, 0]
    qa0 = t.jnt_qposadr[free[0]]
    qpos[qa0:qa0 + 3] = BALL                        # one graspable sphere
    return model, mm, qpos, qa0


def _schedule(model, qpos):
    """Per-step setpoint schedule (T, 7) from our IK (both engines use it)."""
    chain = ArmChain(model)
    q0 = jnp.asarray(qpos, jnp.float32)
    sp = np.tile(HOME[:7], (sum(PHASES), 1)).astype(np.float32)
    # descend stops with the finger pads fully ABOVE the ball: the pick
    # robustly fails in both engines (a grasp at the pinch margin is
    # knife-edge chaotic and flips between engines; the robust-success
    # case is test_box_grasp_lifts_in_both_engines)
    pre, ok1 = _ik(model, chain, [0.0, -0.6, 1.1], q0)
    low, ok2 = _ik(model, chain, [0.0, -0.6, 1.0], q0)
    assert ok1 and ok2
    o = 0
    for i, n in enumerate(PHASES):
        if i == 0:
            sp[o:o + n, :5] = pre
            sp[o:o + n, 6] = 0.0                   # open (half)
        elif i == 1:
            sp[o:o + n, :5] = low
            sp[o:o + n, 6] = 0.0
        elif i == 2:
            sp[o:o + n, :5] = low
            sp[o:o + n, 6] = -0.4                  # close
        else:
            sp[o:o + n, :5] = pre
            sp[o:o + n, 6] = -0.4                  # lift holding
        o += n
    return sp


def _ik(model, chain, target, qpos):
    q5, _, ok = ik_solve(model, chain, jnp.asarray(target, jnp.float32), qpos)
    return np.asarray(q5), bool(ok)


def _mj_rollout(mm, qpos0, schedule):
    dd = mujoco.MjData(mm)
    dd.qpos[:] = qpos0
    act_j = [mm.actuator_trnid[i, 0] for i in range(mm.nu)]
    qadr = np.array([mm.jnt_qposadr[j] for j in act_j])
    g = reference_gains()
    kp, kd = np.asarray(g.kp), np.asarray(g.kd)
    lo, hi = np.asarray(g.out_lo), np.asarray(g.out_hi)
    dt = mm.opt.timestep
    last = None
    traj = []
    for k in range(len(schedule)):
        q = dd.qpos[qadr].copy()
        d = 0.0 if last is None else (q - last) / dt
        last = q
        dd.ctrl[:] = np.clip(kp * (schedule[k] - q) - kd * d, lo, hi)
        mujoco.mj_step(mm, dd)
        traj.append(dd.qpos[qadr].copy())
    return np.array(traj), dd


def _my_rollout(model, qpos0, schedule, ncon=64):
    ctl = Controller(model, ncon=ncon)          # scene iterations (100)
    state = make_state(model).replace(qpos=jnp.asarray(qpos0, jnp.float32))
    cstate = ctl.init(qpos0=jnp.asarray(qpos0, jnp.float32))
    sched = jnp.asarray(schedule)

    def body(carry, sp):
        st, ps = carry
        q = st.qpos[ctl.act_qadr]
        ctrl, ps = pid_output(cstate.params, ps, sp, q, ctl.dt)
        st = dynamics.step(model, st.replace(ctrl=ctrl), ncon=ncon,
                           iterations=ctl.iterations)
        return (st, ps), st.qpos[ctl.act_qadr]

    (st, _), traj = jax.jit(
        lambda s, p: jax.lax.scan(body, (s, p), sched))(state, cstate.pid)
    return np.asarray(traj), st


def test_grasp_sequence_parity(setup):
    """Sphere target, fingers closing above the ball: the pick fails in
    BOTH engines — gates the trajectory MAE through contact and the
    agreement of the failure outcome (flags + no lift)."""
    model, mm, qpos0, ball_qa = setup
    schedule = _schedule(model, qpos0)
    ref_traj, dd = _mj_rollout(mm, qpos0, schedule)
    my_traj, st = _my_rollout(model, qpos0, schedule)

    # contact-free phases hold the BASELINE <1e-3 rad gate; the close phase
    # adds bounded contact-chaos divergence (measured ~2.5e-3 overall)
    pre = slice(0, PHASES[0])
    assert np.abs(my_traj[pre, :6] - ref_traj[pre, :6]).mean() < 1e-3
    mae_arm = np.abs(my_traj[:, :6] - ref_traj[:, :6]).mean()
    assert mae_arm < 5e-3, f"arm MAE {mae_arm:.5f} rad"
    # gripper through the close phase: the ball is being squeezed out, and
    # MuJoCo's pyramidal cone saturates differently than our elliptic one,
    # so the transient differs; the terminal states below must still agree
    mae_grip = np.abs(my_traj[:, 6] - ref_traj[:, 6]).mean()
    assert mae_grip < 1e-1, f"gripper MAE {mae_grip:.5f} rad"

    # grasp flag = fingers did NOT converge to -0.4 (object blocks them,
    # MujocoController.py:436-444 inverted convention)
    blocked_ref = abs(ref_traj[-1, 6] - (-0.4)) > 0.01
    blocked_my = abs(my_traj[-1, 6] - (-0.4)) > 0.01
    assert blocked_ref == blocked_my

    # object lift agreement: both engines agree whether the ball left the
    # table (>3 cm above its rest height)
    z_ref = float(dd.qpos[ball_qa + 2])
    z_my = float(st.qpos[ball_qa + 2])
    assert (z_ref > 0.965) == (z_my > 0.965), (z_ref, z_my)


def test_box_grasp_lifts_in_both_engines(setup):
    """Box target, firm descend (z=0.92). MuJoCo HOLDS the pinched box and
    lifts it to ~[0, -0.6, 1.09] (gated with a proximity check — an
    earlier z-only gate was satisfied by a LAUNCHED box passing z=0.965
    mid-flight). Our engine currently does NOT hold this motor-stall
    pinch: MuJoCo's pyramidal cone makes sticking contacts ~20x stiffer
    than the nominal soft-constraint spring (measured 11.7 kN at 5 mm),
    our elliptic-cone dual reaches its converged optimum near 0.5 kN, the
    fingers sink deeper, and the box is squeezed out — see
    physics/constraints.py ("KNOWN DEVIATION"). This test asserts BOTH
    behaviors so the deviation is tracked: when a future implicit solve
    fixes the pinch, the second gate fails loudly and must be upgraded
    to a hold assertion."""
    model, mm, qpos0, ball_qa = setup
    t = model.topo
    free = np.nonzero(t.jnt_type == JNT_FREE)[0]
    qa_box = t.jnt_qposadr[free[10]]             # object_10: first box
    qpos0 = qpos0.copy()
    qpos0[ball_qa:ball_qa + 3] = [40.0, 40.0, 5.0]   # park setup's sphere
    qpos0[qa_box:qa_box + 3] = [0.0, -0.60, 0.94]
    qpos0[qa_box + 3:qa_box + 7] = [1, 0, 0, 0]

    chain = ArmChain(model)
    q0 = jnp.asarray(qpos0, jnp.float32)
    sp = np.tile(HOME[:7], (sum(PHASES), 1)).astype(np.float32)
    pre, ok1 = _ik(model, chain, [0.0, -0.6, 1.1], q0)
    low, ok2 = _ik(model, chain, [0.0, -0.6, 0.92], q0)
    assert ok1 and ok2
    o = 0
    for i, n in enumerate(PHASES):
        sp[o:o + n, :5] = low if i in (1, 2) else pre
        sp[o:o + n, 6] = -0.4 if i >= 2 else 0.0
        o += n

    _, dd = _mj_rollout(mm, qpos0, sp)
    _, st = _my_rollout(model, qpos0, sp)
    box_ref = np.asarray(dd.qpos[qa_box:qa_box + 3])
    box_my = np.asarray(st.qpos[qa_box:qa_box + 3])
    held_ref = (abs(box_ref[0]) < 0.15 and abs(box_ref[1] + 0.6) < 0.15
                and box_ref[2] > 0.965)
    assert held_ref, f"mujoco did not hold+lift the box ({box_ref})"
    held_my = (abs(box_my[0]) < 0.15 and abs(box_my[1] + 0.6) < 0.15
               and box_my[2] > 0.965)
    assert not held_my, (
        "our engine HELD the stall pinch — the known elliptic-cone "
        "deviation (physics/constraints.py) appears fixed: upgrade this "
        f"gate to assert the hold ({box_my})")
