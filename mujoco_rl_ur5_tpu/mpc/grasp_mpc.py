"""Grasp-MPC: batched iLQR trajectory optimization for the UR5 grasp scenes.

This is the engine the build exists for (BASELINE.md north star: 4096
parallel grasp-MPC solves at H=64 on TPU). It replaces the reference's
planner layer — ikpy IK + serial PID while-loops
(MujocoController.py:269-517) — with trajectory optimization over the
compiled arm dynamics:

  * plans on the ARM SUBMODEL (scene/reduce.py): 8 hinge dofs -> state
    dim 16, so Riccati blocks are tiny and batch perfectly;
  * each MPC knot = `substeps` physics steps (2 ms each), so H=64 knots
    cover 64*substeps*2 ms of motion;
  * costs are differentiable functions of the compiled FK (reaching a world
    EE target uses the same grasp-center offset [0,-0.005,0.16] as the
    reference, MujocoController.py:493) — no IK needed, though tracking
    mode reproduces the PID+IK command sequences for the parity gate;
  * `solve` is pure and jit/vmap-safe; `solve_batch` shards its batch axis
    over a device mesh via parallel/ utilities.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_rl_ur5_tpu.mpc.ilqr import ILQRResult, ilqr
from mujoco_rl_ur5_tpu.mpc.pallas_ilqr import ilqr_chain_batch
from mujoco_rl_ur5_tpu.physics.chain import (
    chain_body_pos, chain_body_xaxis, chain_ee_geom, chain_hold_ctrl,
    chain_step, make_chain_plan,
)
from mujoco_rl_ur5_tpu.scene.model import Model, State
from mujoco_rl_ur5_tpu.scene.reduce import load_arm_model

# gripper grasp-center offset from ee_link (MujocoController.py:493)
EE_OFFSET = np.array([0.0, -0.005, 0.16])


class MPCWeights(NamedTuple):
    """Quadratic cost weights (all scalars; tuned for the UR5 scenes)."""

    w_ee: float = 60.0        # terminal EE position
    w_ee_run: float = 2.0     # running EE position
    w_vel: float = 0.05       # joint velocity damping
    w_ctrl: float = 1e-3      # control effort
    w_posture: float = 0.02   # stay near a reference posture
    w_orient: float = 1.0     # running vertical-gripper orientation
    w_orient_term: float = 20.0  # terminal vertical-gripper orientation
    w_track: float = 50.0     # joint-space tracking (track mode)
    w_track_vel: float = 0.5


class GraspMPC:
    """Batched iLQR grasp planner bound to an arm submodel."""

    def __init__(self, model: Model, horizon: int = 64, substeps: int = 8,
                 iters: int = 6, weights: MPCWeights = MPCWeights(),
                 arm_model: Optional[Model] = None, parallel: bool = True,
                 lin_chunks: int = 8, use_pallas: Optional[bool] = None):
        """``model`` may be the FULL scene model (for index mapping from env
        states); planning runs on ``arm_model`` (auto-reduced when the full
        model still contains free bodies is not possible from a compiled
        Model — pass one from scene.reduce.load_arm_model, or give the scene
        path via from_scene).

        ``use_pallas`` routes the BATCHED solves (solve_batch / track_batch)
        through the fused-kernel iLQR (mpc/pallas_ilqr.py) instead of the
        vmapped generic one; default auto-enables on TPU (interpret-mode
        pallas on CPU is only for the kernel gate tests — it is far slower
        than the vmapped path there)."""
        self.full = model
        self.arm = arm_model if arm_model is not None else model
        t = self.arm.topo
        if np.any(t.jnt_type != 3):  # JNT_HINGE
            raise ValueError("GraspMPC plans on an all-hinge arm submodel; "
                             "use scene.reduce.load_arm_model or from_scene")
        self.H = horizon
        self.substeps = substeps
        self.iters = iters
        self.w = weights
        self.parallel = parallel
        # sequential linearization chunks (memory cap at large B; ilqr
        # docstring). Non-divisors fall back to the largest divisor of the
        # horizon <= lin_chunks — NOT to 1, which would reinstate the
        # full-horizon vmap(jacfwd) HBM peak the parameter exists to prevent.
        self.lin_chunks = next(
            c for c in range(min(lin_chunks, horizon), 0, -1)
            if horizon % c == 0)
        self.nq = t.nq
        self.nu = t.nu
        self.nx = 2 * t.nq
        self.ee_body = t.body_id("ee_link")
        self.act_qadr = t.jnt_qposadr[t.act_jnt]
        # full-model -> arm-model qpos/dof index maps (by joint name)
        ft = model.topo
        self.full_qadr = np.array(
            [ft.jnt_qposadr[ft.joint_id(n)] for n in t.joint_names])
        self.full_dofadr = np.array(
            [ft.jnt_dofadr[ft.joint_id(n)] for n in t.joint_names])
        self.home = np.asarray(
            [0.0, -1.57, 1.57, -1.57, -1.57, 0.0, 0.0, 0.0])[: self.nq]
        self.u_lo = np.asarray(self.arm.act_ctrlrange[:, 0])
        self.u_hi = np.asarray(self.arm.act_ctrlrange[:, 1])
        # straight-line unrolled dynamics for the solve hot path
        # (physics/chain.py; parity-gated vs dynamics.step in tests)
        self.plan = make_chain_plan(self.arm)
        self.use_pallas = (jax.default_backend() == "tpu"
                           if use_pallas is None else use_pallas)
        self._build_kernel_costs()

    @classmethod
    def from_scene(cls, path: str, **kw) -> "GraspMPC":
        from mujoco_rl_ur5_tpu.scene.compile import load_model

        return cls(load_model(path), arm_model=load_arm_model(path), **kw)

    # -- dynamics ------------------------------------------------------------

    def dyn_step(self, x: jax.Array, u: jax.Array) -> jax.Array:
        """One MPC knot = `substeps` smooth physics steps of the arm
        (straight-line chain dynamics, physics/chain.py). The substeps run
        under `lax.scan`, not a Python unroll: the iLQR traces this through
        jacfwd/hessian at every knot, and an unrolled 12-substep body
        multiplied the compiled program enough to take XLA:CPU past its
        limits (the r03 suite-killing backend_compile crash) and TPU
        first-compile past 470 s. The fused Pallas path (use_pallas)
        bypasses this function entirely for batched solves."""
        q, v = x[: self.nq], x[self.nq:]

        def body(qv, _):
            return chain_step(self.plan, qv[0], qv[1], u), None

        (q, v), _ = jax.lax.scan(body, (q, v), None, length=self.substeps)
        return jnp.concatenate([q, v])

    def ee_pos(self, qpos: jax.Array) -> jax.Array:
        """Differentiable grasp-center world position."""
        p = chain_body_pos(self.plan, qpos, self.ee_body)
        return p - jnp.asarray(EE_OFFSET, qpos.dtype)

    def ee_axis_err(self, qpos: jax.Array) -> jax.Array:
        """Deviation of the gripper approach axis from vertical-down — the
        orientation the reference's IK enforces on every move
        (MujocoController.py:498-500: [0, 0, -1], orientation_mode="X").
        Without this objective the optimizer reaches grasp POSITIONS with
        arbitrary wrist poses and the fingers close on air."""
        ax = chain_body_xaxis(self.plan, qpos, self.ee_body)
        return ax - jnp.asarray([0.0, 0.0, -1.0], qpos.dtype)

    def ee_geom(self, qpos: jax.Array):
        """(grasp-center pos, approach axis error, J_pos, J_axis) from one
        FK pass (physics/chain.chain_ee_geom): the shared primitive of the
        reach costs and their Gauss-Newton quadratizations. Callers that
        only need the values leave the Jacobians to XLA's dead-code
        elimination."""
        p, xa, Jp, Ja = chain_ee_geom(self.plan, qpos, self.ee_body)
        return (p - jnp.asarray(EE_OFFSET, qpos.dtype),
                xa - jnp.asarray([0.0, 0.0, -1.0], qpos.dtype), Jp, Ja)

    def hold_ctrl(self, qpos: jax.Array) -> jax.Array:
        """Gravity-compensation controls at rest: ctrl = qfrc_bias / gear,
        clipped to the actuator range. Used as the iLQR warm start so the
        nominal trajectory holds the arm instead of free-falling (a far
        better-conditioned linearization point)."""
        return chain_hold_ctrl(self.plan, qpos)

    # -- state extraction ------------------------------------------------------

    def x_from_state(self, state: State) -> jax.Array:
        """Arm MPC state from a FULL-scene State (env integration)."""
        return jnp.concatenate([
            state.qpos[..., self.full_qadr],
            state.qvel[..., self.full_dofadr],
        ], axis=-1)

    # -- costs -----------------------------------------------------------------

    def _reach_stage(self, x, u, target):
        w = self.w
        q, qd = x[: self.nq], x[self.nq:]
        p, a, _, _ = self.ee_geom(q)
        e = p - target
        posture = q - jnp.asarray(self.home, x.dtype)
        return (0.5 * w.w_ee_run * e @ e
                + 0.5 * w.w_orient * a @ a
                + 0.5 * w.w_vel * qd @ qd
                + 0.5 * w.w_ctrl * u @ u
                + 0.5 * w.w_posture * posture @ posture)

    def _reach_term(self, x, target):
        w = self.w
        q, qd = x[: self.nq], x[self.nq:]
        p, a, _, _ = self.ee_geom(q)
        e = p - target
        return (0.5 * w.w_ee * (e @ e) + 0.5 * w.w_orient_term * (a @ a)
                + 0.5 * 10.0 * w.w_vel * (qd @ qd))

    def _track_stage(self, x, u, ref):
        """ref = (q_ref, qd_ref) joint-space knots (parity mode)."""
        w = self.w
        q, qd = x[: self.nq], x[self.nq:]
        dq = q - ref[0]
        dv = qd - ref[1]
        return (0.5 * w.w_track * dq @ dq + 0.5 * w.w_track_vel * dv @ dv
                + 0.5 * w.w_ctrl * u @ u)

    def _track_term(self, x, ref):
        w = self.w
        dq = x[: self.nq] - ref[0]
        dv = x[self.nq:] - ref[1]
        return 0.5 * 20.0 * w.w_track * dq @ dq + 0.5 * w.w_track_vel * dv @ dv

    # -- analytic (Gauss-Newton) quadratizations for the batched solver ------

    def _reach_quad(self, x, u, target):
        """GN expansion of _reach_stage: FK curvature dropped (standard
        iLQR practice — PSD by construction, and an order of magnitude
        cheaper than jax.hessian through the FK)."""
        w = self.w
        nq = self.nq
        q, qd = x[:nq], x[nq:]
        p, a, J, Ja = self.ee_geom(q)      # geometric Jacobians, one FK
        e = p - target
        eye = jnp.eye(nq, dtype=x.dtype)
        Xq = (w.w_ee_run * J.T @ J + w.w_orient * Ja.T @ Ja
              + w.w_posture * eye)
        X = jax.scipy.linalg.block_diag(Xq, w.w_vel * eye)
        g = jnp.concatenate([
            w.w_ee_run * (J.T @ e) + w.w_orient * (Ja.T @ a)
            + w.w_posture * (q - jnp.asarray(self.home, x.dtype)),
            w.w_vel * qd,
        ])
        U = w.w_ctrl * jnp.eye(self.nu, dtype=x.dtype)
        return X, g, U, w.w_ctrl * u

    def _reach_term_quad(self, x, target):
        w = self.w
        nq = self.nq
        q, qd = x[:nq], x[nq:]
        p, a, J, Ja = self.ee_geom(q)
        e = p - target
        eye = jnp.eye(nq, dtype=x.dtype)
        XH = jax.scipy.linalg.block_diag(
            w.w_ee * J.T @ J + w.w_orient_term * Ja.T @ Ja,
            10.0 * w.w_vel * eye)
        qH = jnp.concatenate([
            w.w_ee * (J.T @ e) + w.w_orient_term * (Ja.T @ a),
            10.0 * w.w_vel * qd])
        return XH, qH

    def _track_quad(self, x, u, ref):
        """Exact (the tracking cost is already quadratic)."""
        w = self.w
        nq = self.nq
        eye = jnp.eye(nq, dtype=x.dtype)
        X = jax.scipy.linalg.block_diag(w.w_track * eye,
                                        w.w_track_vel * eye)
        g = jnp.concatenate([w.w_track * (x[:nq] - ref[0]),
                             w.w_track_vel * (x[nq:] - ref[1])])
        U = w.w_ctrl * jnp.eye(self.nu, dtype=x.dtype)
        return X, g, U, w.w_ctrl * u

    def _track_term_quad(self, x, ref):
        w = self.w
        nq = self.nq
        eye = jnp.eye(nq, dtype=x.dtype)
        XH = jax.scipy.linalg.block_diag(20.0 * w.w_track * eye,
                                         w.w_track_vel * eye)
        qH = jnp.concatenate([20.0 * w.w_track * (x[:nq] - ref[0]),
                              w.w_track_vel * (x[nq:] - ref[1])])
        return XH, qH

    # -- fused in-kernel candidate costs (physics/pallas_chain.rollout_closed)

    def _build_kernel_costs(self):
        """Symbolic stage/terminal cost builders mirroring _reach_stage /
        _track_stage for the fused line-search kernel. Built once per
        instance: the callback objects are static jit keys."""
        from mujoco_rl_ur5_tpu.physics.pallas_chain import (
            make_fk, sadd, smul, ssub,
        )

        w = self.w
        nq, nu = self.nq, self.nu
        slot = int(np.nonzero(self.plan.body_ids == self.ee_body)[0][0])
        fk = make_fk(self.plan)
        off = [float(o) for o in EE_OFFSET]
        down = [0.0, 0.0, -1.0]
        home = [float(h) for h in self.home]

        def sq(xs):
            return sadd(*[smul(x, x) for x in xs], 0.0)

        def ee_err(q, tr):
            xpos, xrot, _, _ = fk(q)
            e = [ssub(ssub(xpos[slot][i], off[i]), tr[i]) for i in range(3)]
            a = [ssub(xrot[slot][i][0], down[i]) for i in range(3)]
            return e, a

        def reach_stage(q, v, u, sr, tr):
            e, a = ee_err(q, tr)
            post = [ssub(q[i], home[i]) for i in range(nq)]
            return sadd(smul(0.5 * w.w_ee_run, sq(e)),
                        smul(0.5 * w.w_orient, sq(a)),
                        smul(0.5 * w.w_vel, sq(v)),
                        smul(0.5 * w.w_ctrl, sq(u)),
                        smul(0.5 * w.w_posture, sq(post)))

        def reach_term_cb(q, v, tr):
            e, a = ee_err(q, tr)
            return sadd(smul(0.5 * w.w_ee, sq(e)),
                        smul(0.5 * w.w_orient_term, sq(a)),
                        smul(0.5 * 10.0 * w.w_vel, sq(v)))

        def track_stage(q, v, u, sr, tr):
            dq = [ssub(q[i], sr[i]) for i in range(nq)]
            dv = [ssub(v[i], sr[nq + i]) for i in range(nq)]
            return sadd(smul(0.5 * w.w_track, sq(dq)),
                        smul(0.5 * w.w_track_vel, sq(dv)),
                        smul(0.5 * w.w_ctrl, sq(u)))

        def track_term_cb(q, v, tr):
            dq = [ssub(q[i], tr[i]) for i in range(nq)]
            dv = [ssub(v[i], tr[nq + i]) for i in range(nq)]
            return sadd(smul(0.5 * 20.0 * w.w_track, sq(dq)),
                        smul(0.5 * w.w_track_vel, sq(dv)))

        self._k_reach = (reach_stage, reach_term_cb)
        self._k_track = (track_stage, track_term_cb)

    # -- solves ------------------------------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def solve(self, x0: jax.Array, target: jax.Array,
              u_init: Optional[jax.Array] = None) -> ILQRResult:
        """Reach the world EE target from MPC state x0 (nx,). Warm-startable
        with u_init for receding-horizon use; defaults to gravity hold."""
        if u_init is None:
            u_init = jnp.tile(self.hold_ctrl(x0[: self.nq])[None],
                              (self.H, 1))
        targets = jnp.tile(target[None], (self.H, 1))
        return ilqr(self.dyn_step, self._reach_stage, self._reach_term,
                    x0, u_init, targets, target, iters=self.iters,
                    parallel=self.parallel, u_lo=self.u_lo, u_hi=self.u_hi,
                    lin_chunks=self.lin_chunks, quad_fn=self._reach_quad,
                    term_quad_fn=self._reach_term_quad)

    @partial(jax.jit, static_argnums=0)
    def solve_batch(self, state: State, targets: jax.Array) -> ILQRResult:
        """Batched solve from a FULL-scene State batch: the north-star
        workload (B scenarios x H knots on one chip). Routed through the
        fused-kernel iLQR on TPU (use_pallas; mpc/pallas_ilqr.py)."""
        x0 = self.x_from_state(state)
        return self.solve_batch_x(x0, targets)

    @partial(jax.jit, static_argnums=0)
    def solve_batch_x(self, x0: jax.Array, targets: jax.Array) -> ILQRResult:
        """Batched reach solve from raw MPC states x0 (B, nx)."""
        if self.use_pallas:
            u_init = jax.vmap(
                lambda x: jnp.tile(self.hold_ctrl(x[: self.nq])[None],
                                   (self.H, 1)))(x0)
            refs = jnp.tile(targets[:, None], (1, self.H, 1))
            return ilqr_chain_batch(
                self.plan, self.substeps, self._reach_stage,
                self._reach_term, x0, u_init, refs, targets,
                iters=self.iters, quad_fn=self._reach_quad,
                term_quad_fn=self._reach_term_quad,
                kernel_cost=(self._k_reach, None, targets))
        return jax.vmap(lambda x, t: self.solve(x, t))(x0, targets)

    @partial(jax.jit, static_argnums=0)
    def track_batch(self, x0: jax.Array, q_refs: jax.Array,
                    qd_refs: Optional[jax.Array] = None,
                    u_init: Optional[jax.Array] = None) -> ILQRResult:
        """Batched tracking solves: x0 (B, nx), q_refs (B, H+1, nq),
        optional warm start u_init (B, H, nu)."""
        if qd_refs is None:
            qd_refs = jnp.zeros_like(q_refs)
        if u_init is None:
            u_init = jax.vmap(
                lambda x: jnp.tile(self.hold_ctrl(x[: self.nq])[None],
                                   (self.H, 1)))(x0)
        if self.use_pallas:
            refs = (q_refs[:, :-1], qd_refs[:, :-1])
            term_ref = (q_refs[:, -1], qd_refs[:, -1])
            sref = jnp.concatenate(refs, axis=-1)          # (B, H, 2nq)
            tref = jnp.concatenate(term_ref, axis=-1)      # (B, 2nq)
            return ilqr_chain_batch(
                self.plan, self.substeps, self._track_stage,
                self._track_term, x0, u_init, refs, term_ref,
                iters=self.iters, quad_fn=self._track_quad,
                term_quad_fn=self._track_term_quad,
                kernel_cost=(self._k_track, sref, tref))
        return jax.vmap(self.track)(x0, q_refs, qd_refs, u_init)

    @partial(jax.jit, static_argnums=0)
    def track(self, x0: jax.Array, q_refs: jax.Array,
              qd_refs: Optional[jax.Array] = None,
              u_init: Optional[jax.Array] = None) -> ILQRResult:
        """Track a joint-space knot trajectory (H+1, nq) — the parity mode
        that reproduces the reference's PID command sequences. Warm-start
        with ``u_init`` (H, nu) for receding-horizon / parity use; defaults
        to the gravity hold."""
        if qd_refs is None:
            qd_refs = jnp.zeros_like(q_refs)
        if u_init is None:
            u_init = jnp.tile(self.hold_ctrl(x0[: self.nq])[None],
                              (self.H, 1))
        term_ref = (q_refs[-1], qd_refs[-1])
        # stage cost at step k is evaluated on x_k; align refs to knots 0..H-1
        refs = (q_refs[:-1], qd_refs[:-1])
        return ilqr(self.dyn_step, self._track_stage, self._track_term,
                    x0, u_init, refs, term_ref, iters=self.iters,
                    parallel=self.parallel, u_lo=self.u_lo, u_hi=self.u_hi,
                    lin_chunks=self.lin_chunks, quad_fn=self._track_quad,
                    term_quad_fn=self._track_term_quad)
