"""MPC-as-policy: plan with GraspMPC, execute through the full contact
scene.

This is the planner-layer replacement SURVEY §7.7 calls for: where the
reference moves the arm with ikpy IK + serial PID tolerance-loops
(gym_grasper/controller/MujocoController.py:269-517) and scripts a grasp
as a sequence of such moves (gym_grasper/envs/GraspingEnv.py:205-386),
this module scripts the same pick with iLQR trajectory optimization as
the arm policy.

Split of authority, chosen to match the planning abstraction:

  * the 6 ARM actuators are driven by the plan: at each knot,
    ``u = clip(u_k + K_k (x - x_k))`` — TVLQR feedback around the
    optimized trajectory, replanned once per phase. The plan lives on the
    contact-free arm submodel (scene/reduce.py), exactly the abstraction
    the reference's ikpy chain uses (it also ignores the objects);
  * the GRIPPER actuator keeps the reference's PID law (setpoint 0.0 =
    open-half, -0.4 = close; MujocoController.py:418-444): finger-object
    interaction is a contact process the contact-free plan cannot
    represent, and the reference's grasp-success protocol ("fingers did
    NOT converge") is defined in terms of that law's fixed point.

Feedback is masked to the arm dofs: the executed finger state diverges
from the plan as soon as the fingers touch an object, and leaking that
error through K would corrupt the arm torques with object-dependent
noise the planner never modeled.

Everything is fixed-shape/fixed-horizon and jit/vmap-safe, like the rest
of the env layer.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_rl_ur5_tpu.control.ik import ArmChain, ik_solve
from mujoco_rl_ur5_tpu.control.pid import (
    PIDState, pid_init, pid_output, reference_gains,
)
from mujoco_rl_ur5_tpu.mpc.grasp_mpc import GraspMPC
from mujoco_rl_ur5_tpu.mpc.ilqr import ILQRResult
from mujoco_rl_ur5_tpu.physics import constraints, dynamics
from mujoco_rl_ur5_tpu.scene.model import Model, State

# gripper-joint close setpoint (MujocoController.py:425: close_gripper
# drives the knuckles to -0.4; open-half is 0.0)
GRIP_OPEN = 0.0
GRIP_CLOSE = -0.4


class PickResult(NamedTuple):
    state: State        # full-scene state after the pick attempt
    pid: PIDState       # gripper PID state (for chaining)
    grasped: jax.Array  # () bool — fingers blocked (reference convention)
    ee_err: jax.Array   # () final planned-phase EE position error [m]


class MPCGraspPolicy:
    """Execute GraspMPC plans on a full contact scene.

    ``mpc`` plans on the arm submodel; ``model`` is the FULL scene whose
    contact dynamics the plan is executed through (same ncon/iterations
    knobs as env/controller)."""

    def __init__(self, model: Model, mpc: GraspMPC, ncon: int = 64,
                 iterations: Optional[int] = None):
        self.model = model
        self.mpc = mpc
        self.ncon = ncon
        self.iterations = (int(model.topo.iterations)
                           if iterations is None else iterations)
        self.nu = int(model.topo.nu)
        self.dt = float(model.topo.timestep)
        self.gains = reference_gains()
        # feedback mask: arm dofs only (see module docstring)
        nq = mpc.nq
        arm = np.zeros(2 * nq, np.float32)
        arm_jnt = [i for i, n in enumerate(mpc.arm.topo.joint_names)
                   if "ik" not in n]            # base_to_lik / base_to_rik
        for i in arm_jnt:
            arm[i] = arm[nq + i] = 1.0
        self.fb_mask = arm
        self.arm_act = np.asarray(arm_jnt, np.int32)       # u indices 0..5
        self.grip_act = np.asarray(
            [i for i in range(self.nu) if i not in arm_jnt], np.int32)
        self.grip_qadr = model.topo.jnt_qposadr[
            model.topo.act_jnt[self.grip_act]]
        self._chain = ArmChain(model)

    # -- plan execution ------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def execute(self, state: State, pid: PIDState, res: ILQRResult,
                grip_sp: jax.Array):
        """Roll the full scene through one plan: H knots x substeps steps.

        Arm channels: u_k + K_k (x - x_k) recomputed at each knot boundary
        (u is knot-constant in the plan's discretization). Gripper channel:
        reference PID at ``grip_sp`` every physics step."""
        m = self.mpc
        fb = jnp.asarray(self.fb_mask, state.qpos.dtype)
        u_lo = jnp.asarray(m.u_lo, state.qpos.dtype)
        u_hi = jnp.asarray(m.u_hi, state.qpos.dtype)

        def knot(carry, plan_k):
            st, ps, warm = carry
            u_k, x_k, K_k = plan_k
            x = m.x_from_state(st)
            u_arm = jnp.clip(u_k + K_k @ ((x - x_k) * fb), u_lo, u_hi)

            def sub(carry, _):
                st, ps, warm = carry
                q = st.qpos[self.model.topo.jnt_qposadr[
                    self.model.topo.act_jnt]]
                sp = q.at[self.grip_act].set(grip_sp)
                pid_u, ps = pid_output(self.gains, ps, sp, q, self.dt)
                ctrl = u_arm.at[self.grip_act].set(pid_u[self.grip_act])
                st, warm = dynamics.step_warm(
                    self.model, st.replace(ctrl=ctrl), warm,
                    ncon=self.ncon, iterations=self.iterations)
                return (st, ps, warm), None

            (st, ps, warm), _ = jax.lax.scan(sub, (st, ps, warm), None,
                                             length=m.substeps)
            return (st, ps, warm), None

        plan = (res.us, res.xs[:-1], res.gains.K)
        warm0 = constraints.init_warm(self.model, state)
        (st, ps, _), _ = jax.lax.scan(knot, (state, pid, warm0), plan)
        return st, ps

    def move_to(self, state: State, pid: PIDState, target: jax.Array,
                grip_sp: jax.Array, wrist=None, fallback=None):
        """Plan a move to the world EE target and execute it. One
        plan-execute round = H*substeps physics steps (fixed horizon; the
        reference's tolerance-while becomes the plan's terminal cost).
        ``wrist`` pins the wrist_3 reference (the env's rotation action,
        GraspingEnv.py:193-197); ``fallback`` is a second IK target used
        when the primary misses the 0.02 m gate (the reference's
        "IK failed -> center" branch, GraspingEnv.py:215-224).

        Planning is IK + `GraspMPC.track` — the parity-gated mode
        (tests/test_mpc_parity.py) — on a linear joint-space ramp to the
        IK solution, exactly the decomposition the reference uses
        (MujocoController.py:446-517: ikpy solves the pose, the joint
        controller realizes it; here iLQR replaces the PID as the
        realizer and returns TVLQR gains for the execution). The direct
        EE-cost `solve` mode works for local corrections but a
        whole-workspace swing (home -> bin) has FK local minima the
        GN-quadratized reach cost cannot escape."""
        m = self.mpc
        x0 = m.x_from_state(state)
        f = x0.dtype
        q5, _, ok = ik_solve(self.model, self._chain, target.astype(f),
                             state.qpos)
        q0 = x0[: m.nq]
        if fallback is not None:
            q5c, _, okc = ik_solve(self.model, self._chain,
                                   jnp.asarray(fallback, f), state.qpos)
            q5 = jnp.where(ok, q5, q5c)
            ok = ok | okc
        qt = q0.at[: q5.shape[-1]].set(jnp.where(ok, q5, q0[: q5.shape[-1]]))
        if wrist is not None:
            qt = qt.at[5].set(jnp.asarray(wrist, f))
        # smoothstep ramp (zero end slope): a LINEAR knot ramp leaves the
        # executed arm at full slew speed at the final knot (~1 rad/s
        # residual measured), which the next phase inherits
        s = jnp.linspace(0.0, 1.0, m.H + 1, dtype=f)[:, None]
        a = s * s * (3.0 - 2.0 * s)
        q_refs = q0[None] * (1 - a) + qt[None] * a
        T = m.H * m.substeps * self.dt
        qd_refs = (qt - q0)[None] * (6.0 * s * (1.0 - s)) / T
        res = m.track(x0, q_refs, qd_refs)
        st, ps = self.execute(state, pid, res, grip_sp)
        ee = m.ee_pos(m.x_from_state(st)[: m.nq])
        return st, ps, jnp.linalg.norm(ee - target)

    @partial(jax.jit, static_argnums=(0, 4))
    def hold(self, state: State, pid: PIDState, grip_sp: jax.Array,
             steps: int):
        """Hold the current arm posture for ``steps`` physics steps while
        the gripper drives to ``grip_sp`` — the reference's stay/close
        phases verbatim (MujocoController.py:418-444, 621-637): the whole
        actuator bank runs the reference PID law with arm setpoints frozen
        at the entry pose. (An earlier torque-PD hold with stiff gains
        saturated the +-2 ctrl clip into a bang-bang limit cycle that
        launched the grasp object; the reference gains are tuned stable
        under the same clip.)"""
        qadr = self.model.topo.jnt_qposadr[self.model.topo.act_jnt]
        sp = state.qpos[qadr].at[self.grip_act].set(grip_sp)

        def sub(carry, _):
            st, ps, warm = carry
            q = st.qpos[qadr]
            u, ps = pid_output(self.gains, ps, sp, q, self.dt)
            st, warm = dynamics.step_warm(self.model, st.replace(ctrl=u),
                                          warm, ncon=self.ncon,
                                          iterations=self.iterations)
            return (st, ps, warm), None

        warm0 = constraints.init_warm(self.model, state)
        (st, ps, _), _ = jax.lax.scan(sub, (state, pid, warm0), None,
                                      length=steps)
        return st, ps

    # -- the scripted pick ---------------------------------------------------

    def pick(self, state: State, coords: jax.Array,
             close_steps: int = 250) -> PickResult:
        """One full MPC-driven pick: pre-grasp above ``coords`` at z=1.1,
        descend to max(0.91, z-0.01), close, lift back to z=1.1 — the
        reference's phase script (GraspingEnv.py:205-316) with every arm
        move planned by iLQR instead of IK+PID. Returns the reference's
        grasp flag (fingers did NOT converge to the close setpoint).

        NOT itself jitted: the phases (solve / execute / hold) are each
        jitted and REUSED across phases and picks — one fused pick-program
        re-traces four solves + ~2000 contact steps into a single XLA
        module, which is exactly the compile-bomb shape that killed the
        r03 CPU suite (grasp_mpc.dyn_step docstring)."""
        f = state.qpos.dtype
        pid = pid_init(self.nu, dtype=f)
        pre = coords.at[2].set(1.1).astype(f)
        low = coords.at[2].set(
            jnp.maximum(0.91, coords[2] - 0.01)).astype(f)
        open_sp = jnp.asarray(GRIP_OPEN, f)
        close_sp = jnp.asarray(GRIP_CLOSE, f)

        st, pid, _ = self.move_to(state, pid, pre, open_sp)
        st, pid, _ = self.move_to(st, pid, low, open_sp)
        # stay(100 ms) before closing (GraspingEnv.py:268: residual descend
        # velocity at the fingertips ejects the object otherwise — verified:
        # the same close law launches the box without this settle)
        st, pid = self.hold(st, pid, open_sp, 50)
        st, pid = self.hold(st, pid, close_sp, close_steps)
        st, pid, ee_err = self.move_to(st, pid, pre, close_sp)

        # grasp flag: fingers blocked away from the close setpoint
        # (GraspingEnv.py:312-327 / MujocoController.py:436-444)
        q_grip = st.qpos[self.grip_qadr]
        grasped = jnp.all(jnp.abs(q_grip - GRIP_CLOSE) > 0.01)
        return PickResult(state=st, pid=pid, grasped=grasped, ee_err=ee_err)
