"""iLQR + GraspMPC tests: convergence on analytic nonlinear systems and
the grasp-MPC reach/tracking solves on the compiled UR5 arm submodel
(scene/reduce.py). The reference has no planner to port (ikpy + PID
while-loops, gym_grasper/controller/MujocoController.py:269-517); the
parity surface is BASELINE.md's gate that MPC tracking reproduces
PID-style joint trajectories."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import ref_scene

from mujoco_rl_ur5_tpu.mpc import GraspMPC, ilqr

SCENE = ref_scene("UR5gripper_2_finger_many_objects.xml")


# -- iLQR on analytic dynamics ----------------------------------------------------


def test_ilqr_double_integrator_reaches_target():
    """iLQR drives a 2D double integrator to a target; parallel and
    sequential backward passes agree on the solution."""
    dt = 0.1
    H = 30
    target = jnp.asarray([1.0, -0.5])

    def dyn(x, u):
        p, v = x[:2], x[2:]
        return jnp.concatenate([p + dt * v, v + dt * u])

    def stage(x, u, ref):
        return 0.5 * 1e-2 * u @ u + 0.5 * 0.1 * (x[:2] - ref) @ (x[:2] - ref)

    def term(x, ref):
        e = x[:2] - ref
        return 0.5 * 50.0 * e @ e + 0.5 * 5.0 * x[2:] @ x[2:]

    x0 = jnp.zeros(4)
    u0 = jnp.zeros((H, 2))
    refs = jnp.tile(target[None], (H, 1))
    sols = {}
    for par in (True, False):
        res = jax.jit(lambda: ilqr(dyn, stage, term, x0, u0, refs, target,
                                   iters=12, parallel=par))()
        err = np.linalg.norm(np.asarray(res.xs[-1][:2]) - np.asarray(target))
        assert err < 1e-2, f"parallel={par}: terminal error {err}"
        sols[par] = np.asarray(res.us)
    np.testing.assert_allclose(sols[True], sols[False], atol=1e-4)


def test_ilqr_nonlinear_pendulum_swing():
    """iLQR swings a damped pendulum to upright — a genuinely nonlinear
    problem (multiple linearization rounds must help)."""
    dt = 0.05
    H = 60

    def dyn(x, u):
        th, w = x[0], x[1]
        wdot = -9.81 * jnp.sin(th) - 0.1 * w + u[0]
        return jnp.asarray([th + dt * w, w + dt * wdot])

    def stage(x, u, ref):
        return 0.5 * 1e-3 * u @ u + 0.5 * 0.1 * (x[0] - jnp.pi) ** 2

    def term(x, ref):
        return 0.5 * 100.0 * (x[0] - jnp.pi) ** 2 + 0.5 * 1.0 * x[1] ** 2

    res = jax.jit(lambda: ilqr(
        dyn, stage, term, jnp.zeros(2), jnp.zeros((H, 1)),
        jnp.zeros((H, 0)), jnp.zeros(0), iters=25))()
    assert abs(float(res.xs[-1][0]) - np.pi) < 0.05


# -- GraspMPC on the compiled arm ------------------------------------------------


@pytest.fixture(scope="module")
def mpc():
    # 16 knots x 12 substeps x 2 ms = 384 ms of motion: enough authority to
    # reach across the bin while keeping CI compile time sane (bench.py runs
    # the full H=64 configuration on the chip)
    return GraspMPC.from_scene(SCENE, horizon=16, substeps=12, iters=8)


def test_arm_submodel_structure(mpc):
    t = mpc.arm.topo
    assert mpc.nq == 8 and mpc.nu == 7            # 6 arm + 2 finger hinges
    assert (t.jnt_type == 3).all()                # all hinges
    # full->arm index maps resolve the same joint names
    ft = mpc.full.topo
    for i, n in enumerate(t.joint_names):
        assert ft.jnt_qposadr[ft.joint_id(n)] == mpc.full_qadr[i]


def test_mpc_hold_ctrl_keeps_arm_up(mpc):
    """Gravity-compensation warm start: rolling out hold_ctrl from home must
    keep the joints near home (without it the arm free-falls)."""
    q0 = jnp.asarray(mpc.home, jnp.float32)
    u = mpc.hold_ctrl(q0)
    x = jnp.concatenate([q0, jnp.zeros(mpc.nq, jnp.float32)])
    for _ in range(10):                      # 10 knots = 160 ms
        x = mpc.dyn_step(x, u)
    drift = float(jnp.abs(x[: mpc.nq] - q0).max())
    assert drift < 0.1, f"arm drifted {drift:.3f} rad under hold_ctrl"


def test_mpc_reach_reduces_ee_error(mpc):
    """Solving a reach must cut the EE-to-target distance by >4x from the
    home pose within the horizon's time window (16 knots x 24 ms), end with
    small joint velocity, and keep controls inside the actuator limits."""
    x0 = jnp.concatenate([jnp.asarray(mpc.home, jnp.float32),
                          jnp.zeros(mpc.nq, jnp.float32)])
    target = jnp.asarray([0.2, -0.5, 1.1], jnp.float32)
    e0 = float(jnp.linalg.norm(mpc.ee_pos(x0[: mpc.nq]) - target))
    res = mpc.solve(x0, target)
    qH = res.xs[-1][: mpc.nq]
    eH = float(jnp.linalg.norm(mpc.ee_pos(qH) - target))
    assert np.isfinite(float(res.cost))
    assert eH < e0 / 4.0, f"EE error {e0:.3f} -> {eH:.3f}"
    assert float(jnp.abs(res.xs[-1][mpc.nq:]).max()) < 1.0
    us = np.asarray(res.us)
    assert (us >= mpc.u_lo[None] - 1e-5).all()
    assert (us <= mpc.u_hi[None] + 1e-5).all()


def test_mpc_track_follows_joint_reference(mpc):
    """Tracking mode: follow a smooth joint-space ramp; mean tracking error
    over the second half of the horizon must be small (the BASELINE parity
    mode that reproduces PID command sequences)."""
    H = mpc.H
    q0 = jnp.asarray(mpc.home, jnp.float32)
    dq = jnp.asarray([0.3, 0.1, -0.2, 0.1, 0.1, 0.5, 0.0, 0.0],
                     jnp.float32)[: mpc.nq]
    alphas = jnp.linspace(0.0, 1.0, H + 1)[:, None]
    q_refs = q0[None] + alphas * dq[None]
    x0 = jnp.concatenate([q0, jnp.zeros(mpc.nq, jnp.float32)])
    res = mpc.track(x0, q_refs)
    err = np.asarray(jnp.abs(res.xs[H // 2:, : mpc.nq] -
                             q_refs[H // 2:]))
    assert err.mean() < 0.05, f"tracking MAE {err.mean():.4f} rad"


def test_mpc_solve_batch_from_full_state():
    """The north-star workload shape: vmapped solves from a FULL-scene
    state batch (tiny B here; bench.py runs B=4096 on the chip).

    Runs in a SUBPROCESS: compiling the vmapped solve after the other
    module fixtures reproducibly crashes the XLA CPU backend
    (SIGSEGV/SIGABRT inside backend_compile) in this environment, while
    the identical compile succeeds in a fresh process."""
    import subprocess
    import sys

    script = f"""
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np, jax.numpy as jnp
from mujoco_rl_ur5_tpu.mpc import GraspMPC
from mujoco_rl_ur5_tpu.scene import make_state
mpc = GraspMPC.from_scene({SCENE!r}, horizon=8, substeps=4, iters=4)
B = 3
state = make_state(mpc.full, (B,))
targets = jnp.tile(jnp.asarray([0.0, -0.6, 1.0], jnp.float32), (B, 1))
res = mpc.solve_batch(state, targets)
assert res.us.shape == (B, mpc.H, mpc.nu), res.us.shape
assert np.isfinite(np.asarray(res.cost)).all()
x0 = mpc.x_from_state(state)
qH = res.xs[:, -1, : mpc.nq]
eH = jnp.linalg.norm(jax.vmap(mpc.ee_pos)(qH) - targets, axis=-1)
e0 = jnp.linalg.norm(jax.vmap(mpc.ee_pos)(x0[:, : mpc.nq]) - targets, axis=-1)
assert (np.asarray(eH) < np.asarray(e0)).all(), (eH, e0)
print('SOLVE_BATCH_OK')
"""
    out = subprocess.run(
        [sys.executable, "-c", script], capture_output=True, text=True,
        timeout=900, cwd="/root/repo")
    assert "SOLVE_BATCH_OK" in out.stdout, (out.returncode, out.stderr[-2000:])
