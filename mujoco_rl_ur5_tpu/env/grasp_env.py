"""Batched grasping environment: the reference GraspEnv's scripted
pick-&-place re-designed as a masked fixed-horizon phase machine.

Reference behavior reproduced (gym_grasper/envs/GraspingEnv.py):
  * action = [pixel_idx, rotation]; x = a0 % W, y = a0 // W (:94-97);
  * world target from the *current observation's* depth at that pixel via
    pixel_2_world (:100-102);
  * skip gate: world z < 0.8 or y > -0.3 -> reward 0, no motion (:124-131);
  * move_and_grasp phase machine (:205-386):
      pre-grasp at z=1.1 (<=1000 steps, tol .05), IK-failure -> center
      fallback [0, -0.6, 1.1]; stuck pre-grasp -> skip rotate/descend/grasp;
      rotate wrist_3 to {0,30,60,90,-30,-60} deg via a group-All move
      (tol .05, <=500, :193-197); open_gripper(half); descend to
      max(0.91, z-0.01) (<=300, tol .01), stuck -> no grasp; stay(100ms);
      grasp() (close <=300, success = fingers did NOT converge);
      shoulder_pan Kp 20->10; center (<=1000, tol .05); drop bin
      [0.6, 0, 1.15] (<=1200, tol .01); final check close_gripper <=1000 only
      if the initial grasp succeeded; grasped = final check hit max steps;
      open_gripper; stay(200ms) if grasped; rotate back to 0; Kp -> 20;
  * binary reward (:142); new RGB-D observation per step (:152);
  * reset: home arm pose, 40 free objects dropped from z in [1.0, 1.5] at
    uniform XY over the bin with uniform random quaternions, settled for
    1000 ms before observing (:409-477).

TPU design: every tolerance-`while` is a masked fixed-horizon `lax.scan`
(control/controller.py); branches ("IK failed -> center", "stuck -> skip")
become per-scenario boolean masks with `jnp.where` state selection, so the
whole env.step jits to one static program and `vmap` scales it to thousands
of parallel scenarios. Rendering is the on-device ray-caster (render/).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_rl_ur5_tpu.control import Controller
from mujoco_rl_ur5_tpu.control.controller import CtrlState, MoveResult
from mujoco_rl_ur5_tpu.physics.kinematics import fk
from mujoco_rl_ur5_tpu.render import make_camera, pixel_2_world
from mujoco_rl_ur5_tpu.render.camera import Camera, depth_2_meters
from mujoco_rl_ur5_tpu.render.raycast import render_rgbd
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_FREE
from mujoco_rl_ur5_tpu.scene.model import Model, State, make_state

# wrist rotations in degrees, GraspingEnv.py:40
ROTATIONS = np.array([0.0, 30.0, 60.0, 90.0, -30.0, -60.0])
TABLE_HEIGHT = 0.91
HOME = np.array([0.0, -1.57, 1.57, -1.57, -1.57, 0.0, 0.3])


@struct.dataclass
class EnvState:
    """Per-scenario environment state (vmap over leading axes)."""

    sim: State
    ctl: CtrlState
    rgb: jax.Array      # (H, W, 3) uint8 current observation
    depth: jax.Array    # (H, W) float metric depth (action decoding source)
    key: jax.Array      # PRNG key


def _select(mask, a, b):
    """Per-scenario pytree select: mask True -> a."""
    return jax.tree.map(
        lambda x, y: jnp.where(
            mask.reshape(mask.shape + (1,) * (x.ndim - mask.ndim)), x, y
        ),
        a, b,
    )


class GraspEnv:
    """Functional batched env bound to a compiled scene."""

    def __init__(self, model: Model, ncon: int = 128,
                 iterations: int | None = None,
                 image_width: int = 200, image_height: int = 200,
                 camera: str = "top_down", demo: bool = False,
                 budget_scale: float = 1.0, mpc=None):
        """``budget_scale`` scales every phase's step budget (and the settle
        times); 1.0 = the reference's budgets (GraspingEnv.py:212-316). Tests
        use small scales to exercise the full phase-machine structure in CI
        time — parity claims only hold at 1.0. ``iterations=None`` follows
        the scene's <option iterations> (100 in the grasp scenes).

        ``mpc`` (a GraspMPC bound to this scene's arm submodel) switches the
        pick policy from the reference's IK+PID phase machine to iLQR
        trajectory optimization executed closed-loop (mpc/policy.py): use
        `step_mpc` instead of `step`."""
        self.model = model
        self.ctl = Controller(model, ncon=ncon, iterations=iterations)
        self.cam: Camera = make_camera(model, camera, image_width, image_height)
        self.W, self.H = image_width, image_height
        self.demo = demo
        self._scale = budget_scale
        t = model.topo
        free = np.nonzero(t.jnt_type == JNT_FREE)[0]
        self.free_qadr = t.jnt_qposadr[free]            # (nobj,)
        self.nobj = len(free)
        self.policy = None
        if mpc is not None:
            from mujoco_rl_ur5_tpu.mpc.policy import MPCGraspPolicy

            self.policy = MPCGraspPolicy(model, mpc, ncon=ncon,
                                         iterations=iterations)
            pol = self.policy
            # phase programs jitted ONCE and reused across phases/steps —
            # tracing the whole pick into one XLA module is the CPU
            # compile-bomb shape (mpc/policy.pick docstring)
            self._mv = jax.jit(jax.vmap(
                lambda st, ps, t, g, w, fb: pol.move_to(
                    st, ps, t, g, wrist=w, fallback=fb)))
            self._hold_cache = {}
            self._observe_v = jax.jit(jax.vmap(self.observe))
            self._decode_v = jax.jit(jax.vmap(self.decode_action))

    def _hold_b(self, st, ps, grip_sp, steps: int):
        fn = self._hold_cache.get(steps)
        if fn is None:
            fn = jax.jit(jax.vmap(
                lambda st, ps, g: self.policy.hold(st, ps, g, steps)))
            self._hold_cache[steps] = fn
        return fn(st, ps, grip_sp)

    def _steps(self, n: int) -> int:
        return max(2, int(round(n * self._scale)))

    # -- observation --------------------------------------------------------

    def observe(self, sim: State):
        kin = fk(self.model, sim.qpos)
        rgb, dbuf = render_rgbd(self.model, kin, self.cam)
        return rgb, depth_2_meters(self.cam, dbuf)

    # -- reset --------------------------------------------------------------

    def reset(self, key: jax.Array) -> EnvState:
        """Domain-randomized pile reset (GraspingEnv.py:409-477)."""
        t = self.model.topo
        sim = make_state(self.model)
        qpos = sim.qpos.at[self.ctl.act_qadr].set(jnp.asarray(HOME, sim.qpos.dtype))
        key, kx, ky, kz, kq = jax.random.split(key, 5)
        xs = jax.random.uniform(kx, (self.nobj,), minval=-0.25, maxval=0.25)
        ys = jax.random.uniform(ky, (self.nobj,), minval=-0.77, maxval=-0.43)
        zs = jax.random.uniform(kz, (self.nobj,), minval=1.0, maxval=1.5)
        # uniform random unit quaternions (normalized Gaussian == Shoemake)
        quats = jax.random.normal(kq, (self.nobj, 4))
        quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
        qa = self.free_qadr
        qpos = qpos.at[qa].set(xs).at[qa + 1].set(ys).at[qa + 2].set(zs)
        for k in range(4):
            qpos = qpos.at[qa + 3 + k].set(quats[:, k])
        sim = sim.replace(qpos=qpos, qvel=jnp.zeros_like(sim.qvel))
        cstate = self.ctl.init(qpos0=qpos)
        # settle: objects fall into the bin (1000 ms; 5000 in demo mode)
        res = self.ctl.stay(sim, cstate,
                            (5000.0 if self.demo else 1000.0) * self._scale)
        rgb, depth = self.observe(res.state)
        return EnvState(sim=res.state, ctl=res.ctrl, rgb=rgb, depth=depth, key=key)

    # -- step ---------------------------------------------------------------

    def decode_action(self, es: EnvState, action: jax.Array):
        """[pixel_idx, rotation] -> world grasp point (GraspingEnv.py:94-102)."""
        x = action[0] % self.W
        y = action[0] // self.W
        depth = es.depth[y, x]
        coords = pixel_2_world(self.cam, x.astype(depth.dtype),
                               y.astype(depth.dtype), depth)
        return coords, action[1]

    def step(self, es: EnvState, action: jax.Array):
        """One RL step = one scripted pick-&-place. Returns
        (EnvState, reward, done, info). vmap for batches."""
        coords, rotation = self.decode_action(es, action)
        skip = (coords[2] < 0.8) | (coords[1] > -0.3)   # bad-depth gate :124
        before = (es.sim, es.ctl)
        sim, ctl, grasped = self.move_and_grasp(es.sim, es.ctl, coords, rotation)
        # skipped scenarios do not move at all
        sim, ctl = _select(skip, before, (sim, ctl))
        reward = jnp.where(skip, 0.0, grasped.astype(jnp.float32))
        rgb, depth = self.observe(sim)
        es = es.replace(sim=sim, ctl=ctl, rgb=rgb, depth=depth)
        return es, reward, jnp.zeros_like(skip), {"grasped": grasped & ~skip}

    def step_mpc(self, es: EnvState, action: jax.Array):
        """One RL step with the MPC pick policy: the reference's scripted
        phases (GraspingEnv.py:205-316) with every arm motion planned by
        iLQR and executed as TVLQR feedback through the contact scene
        (mpc/policy.py), gripper on the reference PID law.

        BATCHED interface: es/action carry a leading batch axis, and this
        method must NOT be wrapped in an outer jit/vmap — each phase is a
        separately-jitted program reused across phases and steps. Skip
        gate, IK-center fallback, rotation action, grasp protocol, and
        binary reward follow `step`."""
        from mujoco_rl_ur5_tpu.mpc.policy import GRIP_CLOSE, GRIP_OPEN

        if self.policy is None:
            raise ValueError("construct GraspEnv with mpc=GraspMPC(...) "
                             "to use step_mpc")
        pol = self.policy
        f = es.sim.qpos.dtype
        B = action.shape[0]
        S = self._steps
        coords, rotation = self._decode_v(es, action)
        skip = (coords[:, 2] < 0.8) | (coords[:, 1] > -0.3)

        wrist = jnp.deg2rad(jnp.asarray(ROTATIONS, f))[rotation]
        open_sp = jnp.full((B,), GRIP_OPEN, f)
        close_sp = jnp.full((B,), GRIP_CLOSE, f)
        center = jnp.tile(jnp.asarray([0.0, -0.6, 1.1], f), (B, 1))
        drop = jnp.tile(jnp.asarray([0.6, 0.0, 1.15], f), (B, 1))
        wrist0 = jnp.zeros((B,), f)
        c1 = coords.at[:, 2].set(1.1)
        c2 = coords.at[:, 2].set(
            jnp.maximum(TABLE_HEIGHT, coords[:, 2] - 0.01))

        pid0 = es.ctl.pid
        # pre-grasp (IK miss -> center fallback), rotate, descend
        st, ps, _ = self._mv(es.sim, pid0, c1, open_sp, wrist, center)
        st, ps, e2 = self._mv(st, ps, c2, open_sp, wrist, c2)
        st, ps = self._hold_b(st, ps, open_sp, S(50))       # stay 100 ms
        st, ps = self._hold_b(st, ps, close_sp, S(300))     # grasp
        qg = st.qpos[:, pol.grip_qadr]
        grasp_ok = (e2 < 0.05) & jnp.all(
            jnp.abs(qg - GRIP_CLOSE) > 0.01, axis=-1)
        # transport (closed): center, then drop bin + wrist back to 0
        st, ps, _ = self._mv(st, ps, center, close_sp, wrist, center)
        st, ps, _ = self._mv(st, ps, drop, close_sp, wrist0, drop)
        # final check: fingers still blocked after transport (:312-327)
        st, ps = self._hold_b(st, ps, close_sp, S(300))
        qg = st.qpos[:, pol.grip_qadr]
        grasped = grasp_ok & jnp.all(
            jnp.abs(qg - GRIP_CLOSE) > 0.01, axis=-1)
        st, ps = self._hold_b(st, ps, open_sp, S(100))      # release

        sim = _select(skip, es.sim, st)
        ps = _select(skip, pid0, ps)
        reward = jnp.where(skip, 0.0, grasped.astype(jnp.float32))
        rgb, depth = self._observe_v(sim)
        es = es.replace(sim=sim, ctl=es.ctl.replace(pid=ps),
                        rgb=rgb, depth=depth)
        return es, reward, jnp.zeros_like(skip), {"grasped": grasped & ~skip}

    # -- the phase machine --------------------------------------------------

    def move_and_grasp(self, sim: State, ctl: CtrlState, coords, rotation):
        C = self.ctl
        S = self._steps
        f32 = sim.qpos.dtype

        # 1. pre-grasp above target; IK failure -> center fallback
        c1 = coords.at[2].set(1.1).astype(f32)
        r1 = C.move_ee(sim, ctl, c1, tolerance=0.05, max_steps=S(1000))
        rc = C.move_ee(r1.state, r1.ctrl, jnp.asarray([0.0, -0.6, 1.1], f32),
                       tolerance=0.05, max_steps=S(1000))
        need_center = ~r1.ik_ok
        sim1, ctl1 = _select(need_center, (rc.state, rc.ctrl),
                             (r1.state, r1.ctrl))
        pre_ok = jnp.where(need_center, rc.success, r1.success)

        # 2-4. rotate wrist_3, open half, descend, stay, grasp — all masked
        #      out when the pre-grasp got stuck ("Skipped", :242-248)
        wrist_target = jnp.deg2rad(jnp.asarray(ROTATIONS, f32))[rotation]
        sp = ctl1.setpoints.at[..., 5].set(wrist_target)
        rr = C._run(sim1, ctl1.replace(setpoints=sp),
                    jnp.ones(C.nu, bool), 0.05, S(500))    # group-All move :196
        ro = C.open_gripper(rr.state, rr.ctrl, half=True, max_steps=S(1000))
        c2 = coords.at[2].set(
            jnp.maximum(TABLE_HEIGHT, coords[2] - 0.01)
        ).astype(f32)
        rd = C.move_ee(ro.state, ro.ctrl, c2, tolerance=0.01, max_steps=S(300))
        rs = C.stay(rd.state, rd.ctrl, 100.0 * self._scale)
        rg = C.grasp(rs.state, rs.ctrl, max_steps=S(300))
        # grasp only counts if the descend reached its target (:272-279)
        grasp_ok = pre_ok & rd.success & rg.success
        sim2, ctl2 = _select(pre_ok, (rg.state, rg.ctrl), (sim1, ctl1))

        # 5. transport: shoulder_pan Kp -> 10, center, drop bin (:282-305)
        ctl2 = C.set_kp(ctl2, 0, 10.0)
        r3 = C.move_ee(sim2, ctl2, jnp.asarray([0.0, -0.6, 1.1], f32),
                       tolerance=0.05, max_steps=S(1000))
        r4 = C.move_ee(r3.state, r3.ctrl, jnp.asarray([0.6, 0.0, 1.15], f32),
                       tolerance=0.01, max_steps=S(1200))

        # 6. final finger check (only when the initial grasp succeeded):
        #    close hits max steps <=> an object still blocks the fingers
        rf = C.close_gripper(r4.state, r4.ctrl,
                             max_steps=S(100 if self.demo else 1000),
                             tolerance=0.01)
        sim3, ctl3 = _select(grasp_ok, (rf.state, rf.ctrl),
                             (r4.state, r4.ctrl))
        grasped = grasp_ok & ~rf.success                    # :312-327

        # 7. open, settle if grasped, rotate wrist back, Kp -> 20 (:338-347)
        rop = C.open_gripper(sim3, ctl3, half=False, max_steps=S(1000))
        rst = C.stay(rop.state, rop.ctrl, 200.0 * self._scale)
        sim4, ctl4 = _select(grasped, (rst.state, rst.ctrl),
                             (rop.state, rop.ctrl))
        sp = ctl4.setpoints.at[..., 5].set(0.0)
        rb = C._run(sim4, ctl4.replace(setpoints=sp), jnp.ones(C.nu, bool),
                    0.05, S(500))
        ctl5 = C.set_kp(rb.ctrl, 0, 20.0)
        return rb.state, ctl5, grasped
