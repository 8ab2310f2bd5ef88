"""Motion primitives: the reference MJ_Controller re-designed as fixed-horizon
masked rollouts.

Reference semantics reproduced (MujocoController.py):
  * joint groups "All"=actuators 0-6, "Arm"=0-4 (wrist_3 excluded!),
    "Gripper"=[6] (:41-42);
  * ALL seven PIDs actuate every physics step regardless of the moved group,
    so idle joints hold their setpoints instead of drifting (:323-327);
  * a motion succeeds when every group joint is within `tolerance` of its
    setpoint, checked BEFORE the physics step — on success the state is not
    stepped again (:318-382);
  * `grasp()` returns True when close_gripper FAILED to converge within 300
    steps, i.e. an object blocks the fingers (:436-444, inverted convention);
  * `stay(ms)` holds all setpoints; the reference loops 10-step chunks for
    `ms` of *wall-clock* time (nondeterministic) — here `ms` is simulated
    time: round(ms / 1000 / timestep) steps.

TPU design: the tolerance-`while` becomes `lax.scan` over `max_steps` with a
per-scenario `done` mask that freezes converged scenarios (their terminal
state is bit-identical to an early exit). Batched rollouts run lockstep, so
masked steps cost nothing extra; `vmap(move_fn)` is the 4096-wide hot loop.
"""

from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_rl_ur5_tpu.control.ik import ArmChain, ik_solve
from mujoco_rl_ur5_tpu.control.pid import (
    PIDParams, PIDState, pid_init, pid_output, reference_gains,
)
from mujoco_rl_ur5_tpu.physics import constraints, dynamics, fk
from mujoco_rl_ur5_tpu.scene.model import Model, State

GROUPS = {"All": (0, 1, 2, 3, 4, 5, 6), "Arm": (0, 1, 2, 3, 4), "Gripper": (6,)}


@struct.dataclass
class CtrlState:
    """Per-scenario controller state (functional analogue of MJ_Controller's
    mutable PID objects + current_target_joint_values)."""

    pid: PIDState
    setpoints: jax.Array   # (..., nu)
    params: PIDParams      # dynamic: the env mutates shoulder_pan Kp 21->10->20


@struct.dataclass
class MoveResult:
    state: State
    ctrl: CtrlState
    success: jax.Array   # (...,) bool — tolerance reached within max_steps
    steps: jax.Array     # (...,) int32 — physics steps actually integrated
    ik_ok: jax.Array = None  # (...,) bool — move_ee only: IK gate passed
                             # (the reference's "No valid solution found"
                             # branch, MujocoController.py:465,512-517)


class Controller:
    """Static controller configuration bound to a compiled model.

    All methods are pure functions of (State, CtrlState) and jit/vmap-safe;
    `group`, `tolerance`, `max_steps` are trace-time constants, matching the
    reference's call sites (each call site hardcodes its budget, SURVEY §3.2).
    """

    def __init__(self, model: Model, ncon: int = 64,
                 iterations: int | None = None):
        """``iterations=None`` uses the scene's own solver iteration budget
        (<option iterations=...>, e.g. 100 in the grasp scenes) — the parity
        default. Pass a smaller count to trade fidelity for speed."""
        self.model = model
        self.ncon = ncon
        self.iterations = (model.topo.iterations if iterations is None
                           else iterations)
        t = model.topo
        # actuated joint addresses, in actuator order
        self.act_qadr = t.jnt_qposadr[t.act_jnt]       # (nu,)
        self.act_dofadr = t.act_dofadr
        self.nu = t.nu
        self.chain = ArmChain(model)
        self.ee_body = t.body_id("ee_link")
        self.dt = t.timestep
        # instance-level groups so `create_group` can extend them
        self.groups = dict(GROUPS)

    def create_group(self, name: str, actuator_ids) -> None:
        """Define an ad-hoc joint group (MujocoController.py:58-77)."""
        ids = tuple(int(i) for i in actuator_ids)
        assert len(set(ids)) == len(ids), "duplicate actuator ids"
        assert all(0 <= i < self.nu for i in ids), "actuator id out of range"
        self.groups[name] = ids

    # -- state constructors -------------------------------------------------

    def init(self, qpos0: jax.Array | None = None, batch_shape=(),
             dtype=jnp.float32) -> CtrlState:
        """Initial controller state: setpoints at the reference's construction
        defaults (MujocoController.py:166-235)."""
        sp = jnp.broadcast_to(
            jnp.asarray([0.0, -1.57, 1.57, -1.57, -1.57, 0.0, 0.0], dtype),
            batch_shape + (self.nu,),
        )
        if qpos0 is not None:
            sp = qpos0[..., self.act_qadr]
        params = reference_gains(dtype)
        if batch_shape:
            params = jax.tree.map(
                lambda x: jnp.broadcast_to(x, batch_shape + x.shape), params
            )
        return CtrlState(pid=pid_init(self.nu, batch_shape, dtype),
                         setpoints=sp, params=params)

    def set_kp(self, cstate: CtrlState, actuator: int, value) -> CtrlState:
        """Functional analogue of `controller.actuators[i][4].Kp = v`
        (GraspingEnv.py:282,347)."""
        kp = cstate.params.kp.at[..., actuator].set(value)
        return cstate.replace(params=cstate.params.replace(kp=kp))

    # -- core motion loop ---------------------------------------------------

    def move_group(self, state: State, cstate: CtrlState, group: str,
                   target: jax.Array | None, tolerance: float,
                   max_steps: int, record: bool = False):
        """`move_group_to_joint_target` (MujocoController.py:269) as a masked
        fixed-horizon scan. `target=None` re-converges to current setpoints.
        `record=True` additionally returns the (max_steps, nu) actuated-joint
        trajectory (the reference's `plot=True` capture, :639-654) as a
        second output."""
        ids = np.asarray(self.groups[group], np.int32)
        gmask = np.zeros(self.nu, bool)
        gmask[ids] = True

        setpoints = cstate.setpoints
        if target is not None:
            setpoints = setpoints.at[..., ids].set(target)
        cstate = cstate.replace(setpoints=setpoints)
        return self._run(state, cstate, jnp.asarray(gmask), tolerance,
                         max_steps, record=record)

    def _run(self, state: State, cstate: CtrlState, gmask, tolerance,
             max_steps: int, check_tolerance: bool = True,
             record: bool = False):
        model, ncon, iters, dt = self.model, self.ncon, self.iterations, self.dt
        qadr = self.act_qadr

        def body(carry, _):
            st, ps, warm, done, steps = carry
            q = st.qpos[..., qadr]
            ctrl, ps_new = pid_output(cstate.params, ps, cstate.setpoints, q, dt)
            if check_tolerance:
                deltas = jnp.abs(cstate.setpoints - q)
                reached = jnp.max(jnp.where(gmask, deltas, 0.0), axis=-1) < tolerance
            else:
                reached = jnp.zeros_like(done)
            done_new = done | reached
            st_new, warm_new = dynamics.step_warm(
                model, st.replace(ctrl=ctrl), warm, ncon=ncon,
                iterations=iters)
            keep = done_new
            st_out = jax.tree.map(
                lambda a, b: jnp.where(
                    keep.reshape(keep.shape + (1,) * (a.ndim - keep.ndim)), a, b
                ),
                st, st_new,
            )
            ps_out = jax.tree.map(
                lambda a, b: jnp.where(
                    keep.reshape(keep.shape + (1,) * (a.ndim - keep.ndim)), a, b
                ),
                ps, ps_new,
            )
            steps = steps + jnp.where(done_new, 0, 1).astype(jnp.int32)
            out = st_out.qpos[..., qadr] if record else None
            return (st_out, ps_out, warm_new, done_new, steps), out

        batch = state.time.shape
        done0 = jnp.zeros(batch, bool)
        steps0 = jnp.zeros(batch, jnp.int32)
        # warm-started constraint solver within the move (dynamics.step_warm:
        # stiff persistent contacts — a grasp pinch — need the accumulated
        # forces; each move starts cold, matching a freshly-reset solver)
        warm0 = jax.tree.map(
            lambda a: jnp.broadcast_to(a, batch + a.shape),
            constraints.init_warm(self.model,
                                  jax.tree.map(lambda x: x[(0,) * len(batch)]
                                               if batch else x, state)))
        (st, ps, _, done, steps), traj = jax.lax.scan(
            body, (state, cstate.pid, warm0, done0, steps0), None,
            length=max_steps
        )
        res = MoveResult(state=st, ctrl=cstate.replace(pid=ps),
                         success=done, steps=steps)
        return (res, traj) if record else res

    # -- reference API parity -----------------------------------------------

    def move_ee(self, state: State, cstate: CtrlState, position: jax.Array,
                tolerance: float = 0.1, max_steps: int = 10000) -> MoveResult:
        """IK + Arm move (MujocoController.py:446-465). Scenarios whose IK
        misses the 0.02 m gate do not move (their setpoints stay), and their
        `success` is False — the env layer substitutes the center fallback."""
        q5, _, ok = self._ik(state, position)
        ids = np.asarray(GROUPS["Arm"], np.int32)
        sp = cstate.setpoints.at[..., ids].set(
            jnp.where(ok[..., None], q5, cstate.setpoints[..., ids])
        )
        res = self._run(state.replace(), cstate.replace(setpoints=sp),
                        jnp.asarray(np.isin(np.arange(self.nu), ids)),
                        tolerance, max_steps)
        return res.replace(success=res.success & ok, ik_ok=ok)

    def _ik(self, state: State, position: jax.Array):
        if state.time.ndim:
            return jax.vmap(lambda p, q: ik_solve(self.model, self.chain, p, q))(
                position, state.qpos
            )
        return ik_solve(self.model, self.chain, position, state.qpos)

    def open_gripper(self, state, cstate, half=False, max_steps=1000):
        t = 0.0 if half else 0.4
        return self.move_group(state, cstate, "Gripper", jnp.full((1,), t),
                               tolerance=0.05, max_steps=max_steps)

    def close_gripper(self, state, cstate, max_steps=10000, tolerance=0.01):
        return self.move_group(state, cstate, "Gripper", jnp.full((1,), -0.4),
                               tolerance=tolerance, max_steps=max_steps)

    def grasp(self, state, cstate, max_steps: int = 300):
        """True when an object blocks the fingers (inverted convention,
        MujocoController.py:436-444)."""
        res = self.close_gripper(state, cstate, max_steps=max_steps)
        return res.replace(success=~res.success)

    def toss_it_from_the_ellbow(self, state, cstate,
                                settle_steps: int = 2000) -> MoveResult:
        """The reference's object-toss demo (MujocoController.py:604-619):
        300 raw-torque steps (elbow/shoulder full negative; after step 200
        also open the gripper and flick wrist_1), then zero torques and
        re-converge every joint to its current setpoint."""
        model, ncon, iters = self.model, self.ncon, self.iterations

        def body(st, t):
            ctrl = (jnp.zeros_like(st.ctrl)
                    .at[..., 2].set(-2.0).at[..., 0].set(-2.0))
            late = (t > 200).astype(ctrl.dtype)
            ctrl = ctrl.at[..., 6].add(late * 1.0).at[..., 3].add(late * -1.0)
            st = dynamics.step(model, st.replace(ctrl=ctrl), ncon=ncon,
                               iterations=iters)
            return st, None

        st, _ = jax.lax.scan(body, state, jnp.arange(300))
        return self.move_group(st, cstate, "All", None, tolerance=0.1,
                               max_steps=settle_steps)

    def stay(self, state, cstate, duration_ms: float) -> MoveResult:
        """Hold all setpoints for `duration_ms` of simulated time
        (MujocoController.py:621-637; see module docstring re wall-clock)."""
        n = max(1, int(round(duration_ms / 1000.0 / self.dt)))
        gmask = jnp.ones(self.nu, bool)
        return self._run(state, cstate, gmask, 0.0, n, check_tolerance=False)

    # -- kinematic readouts --------------------------------------------------

    def grasp_center(self, state: State) -> jax.Array:
        """World position of the gripper grasp center
        (`ee_link` - [0,-0.005,0.16], MujocoController.py:341-345)."""
        kin = self._fk(state)
        off = jnp.asarray([0.0, -0.005, 0.16], state.qpos.dtype)
        return kin.xpos[..., self.ee_body, :] - off

    def _fk(self, state: State):
        if state.time.ndim:
            return jax.vmap(lambda q: fk(self.model, q))(state.qpos)
        return fk(self.model, state.qpos)
