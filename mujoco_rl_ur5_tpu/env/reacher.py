"""Reacher task on UR5gripper_reacher.xml (BASELINE.md config 1).

The reference ships the scene (/root/reference/UR5+gripper/
UR5gripper_reacher.xml: arm + 3-finger gripper, a free "target" body on
three slide joints with ranges x [-.27,.27], y [-.2,.2], z [-.15,.15],
:260-264) but has NO task code for it — the scene predates the grasping env
(README IT changelog). This module supplies the task the BASELINE defines:
6-DoF PID reach to a randomized target, H=500 contact-free steps.

Design: same functional batched pattern as GraspEnv. Actions are the six
arm-joint setpoints; each `step` advances `frame_skip` physics steps with
the reference PID gains (MujocoController.py:160-235, first six
controllers). `reach_ik` is the scripted primitive (IK -> PID until
tolerance) used for the PID-reach parity gate; reward is the negative
EE-to-target distance with a 5 cm success bonus.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_rl_ur5_tpu.control.ik import ArmChain, ik_solve
from mujoco_rl_ur5_tpu.control.pid import (
    PIDParams, PIDState, pid_init, pid_output, reference_gains,
)
from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.physics.kinematics import fk
from mujoco_rl_ur5_tpu.scene.model import Model, State, make_state

ARM_HOME = np.array([0.0, -1.57, 1.57, -1.57, -1.57, 0.0])
SUCCESS_RADIUS = 0.05


@struct.dataclass
class ReacherState:
    sim: State
    pid: PIDState          # (.., 6) arm PID bank
    setpoints: jax.Array   # (..., 6)
    target: jax.Array      # (..., 3) world target position
    key: jax.Array


class ReacherEnv:
    """Functional batched reacher bound to the compiled reacher scene."""

    def __init__(self, model: Model, ncon: int = 0,
                 iterations: int | None = None, frame_skip: int = 5):
        self.model = model
        t = model.topo
        self.ncon = ncon
        self.iterations = (t.iterations if iterations is None else iterations)
        self.frame_skip = frame_skip
        self.nu = t.nu
        # the six arm motors are actuators 0..5 (UR5gripper_reacher.xml:332+)
        self.arm_qadr = t.jnt_qposadr[t.act_jnt[:6]]
        g = reference_gains()
        self.params = PIDParams(kp=g.kp[:6], ki=g.ki[:6], kd=g.kd[:6],
                                out_lo=g.out_lo[:6], out_hi=g.out_hi[:6])
        # target slide joints (scene :261-263)
        tj = np.asarray([t.joint_id(f"target_{ax}") for ax in "xyz"])
        self.target_qadr = t.jnt_qposadr[tj]
        self.target_range = np.asarray(model.jnt_range)[tj]   # (3, 2)
        self.target_body = t.body_id("target")
        self.ee_body = t.body_id("ee_link")
        self.chain = ArmChain(model)
        self.dt = t.timestep

    # -- core -----------------------------------------------------------------

    def ee_pos(self, qpos: jax.Array) -> jax.Array:
        """Gripper reference point: the grasp center the IK solves for
        (ee_link minus the [0,-0.005,0.16] offset, MujocoController.py:493),
        so `dist` after reach_ik reflects IK accuracy, not the fixed
        tip-to-palm offset."""
        from mujoco_rl_ur5_tpu.control.ik import EE_OFFSET

        return (fk(self.model, qpos).xpos[self.ee_body]
                - jnp.asarray(EE_OFFSET, qpos.dtype))

    def _phys(self, sim: State, pid: PIDState, setpoints, n: int):
        def body(carry, _):
            st, ps = carry
            q = st.qpos[..., self.arm_qadr]
            ctrl, ps = pid_output(self.params, ps, setpoints, q, self.dt)
            full = jnp.zeros_like(st.ctrl).at[..., :6].set(ctrl)
            st = dynamics.step(self.model, st.replace(ctrl=full),
                               ncon=self.ncon, iterations=self.iterations)
            return (st, ps), None

        (sim, pid), _ = jax.lax.scan(body, (sim, pid), None, length=n)
        return sim, pid

    # -- api ---------------------------------------------------------------------

    def reset(self, key: jax.Array) -> ReacherState:
        sim = make_state(self.model)
        qpos = sim.qpos.at[self.arm_qadr].set(
            jnp.asarray(ARM_HOME, sim.qpos.dtype))
        key, kt = jax.random.split(key)
        tq = jax.random.uniform(
            kt, (3,), minval=self.target_range[:, 0],
            maxval=self.target_range[:, 1]).astype(sim.qpos.dtype)
        qpos = qpos.at[self.target_qadr].set(tq)
        sim = sim.replace(qpos=qpos, qvel=jnp.zeros_like(sim.qvel))
        target = fk(self.model, qpos).xpos[self.target_body]
        return ReacherState(
            sim=sim, pid=pid_init(6, dtype=sim.qpos.dtype),
            setpoints=jnp.asarray(ARM_HOME, sim.qpos.dtype), target=target,
            key=key)

    def observe(self, es: ReacherState) -> jax.Array:
        """State observation: [q_arm(6), qd_arm(6), target(3), ee(3)]."""
        q = es.sim.qpos[..., self.arm_qadr]
        qd = es.sim.qvel[..., self.arm_qadr]  # hinge: dofadr == qposadr here
        return jnp.concatenate([q, qd, es.target, self.ee_pos(es.sim.qpos)])

    def step(self, es: ReacherState, action: jax.Array):
        """action = six desired arm-joint angles; `frame_skip` PID steps.
        Returns (state, reward, done, info)."""
        sp = jnp.clip(action, -np.pi, np.pi).astype(es.setpoints.dtype)
        sim, pid = self._phys(es.sim, es.pid, sp, self.frame_skip)
        es = es.replace(sim=sim, pid=pid, setpoints=sp)
        dist = jnp.linalg.norm(self.ee_pos(sim.qpos) - es.target)
        success = dist < SUCCESS_RADIUS
        reward = -dist + jnp.where(success, 1.0, 0.0)
        return es, reward, success, {"dist": dist, "success": success}

    def reach_ik(self, es: ReacherState, max_steps: int = 500,
                 tolerance: float = 0.05):
        """Scripted reach: IK to the target, then PID until every arm joint
        is within `tolerance` rad (masked fixed-horizon, same semantics as
        Controller.move_ee). The BASELINE config-1 workload."""
        q5, _, ok = ik_solve(self.model, self.chain, es.target, es.sim.qpos)
        sp = es.setpoints.at[:5].set(jnp.where(ok, q5, es.setpoints[:5]))

        def body(carry, _):
            st, ps, done, steps = carry
            q = st.qpos[..., self.arm_qadr]
            reached = jnp.max(jnp.abs(sp - q)) < tolerance
            done = done | reached
            ctrl, ps_new = pid_output(self.params, ps, sp, q, self.dt)
            full = jnp.zeros_like(st.ctrl).at[..., :6].set(ctrl)
            st_new = dynamics.step(self.model, st.replace(ctrl=full),
                                   ncon=self.ncon,
                                   iterations=self.iterations)
            keep = lambda a, b: jnp.where(done, a, b)
            st = jax.tree.map(keep, st, st_new)
            ps = jax.tree.map(keep, ps, ps_new)
            return (st, ps, done, steps + (~done).astype(jnp.int32)), None

        (sim, pid, done, steps), _ = jax.lax.scan(
            body, (es.sim, es.pid, jnp.zeros((), bool),
                   jnp.zeros((), jnp.int32)), None, length=max_steps)
        es = es.replace(sim=sim, pid=pid, setpoints=sp)
        dist = jnp.linalg.norm(self.ee_pos(sim.qpos) - es.target)
        return es, {"ik_ok": ok, "converged": done, "steps": steps,
                    "dist": dist}
