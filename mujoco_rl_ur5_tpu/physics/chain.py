"""Specialized all-hinge chain dynamics for the MPC hot path.

The generic tree pipeline (physics/dynamics.py) handles every scene the
compiler can produce — free-floating piles, ball joints, padded tree blocks —
at the cost of gather/scatter/mask machinery on every step. Inside the MPC
solve (mpc/grasp_mpc.py) that generality is waste: the planning model is a
fixed-base arm+gripper tree of <= ~16 hinge dofs (scene/reduce.py), stepped
thousands of times sequentially per solve (rollouts) and differentiated with
24-wide jacfwd tangents per knot (linearization). This module is the same
physics — MuJoCo-convention CRBA + RNE + implicit-damping semi-implicit
Euler, parity-gated against `dynamics.step` — re-expressed as STRAIGHT-LINE
code for a static chain:

  * the kinematic recursion is unrolled over the ~12 moving bodies at trace
    time: no levels, no scatters, no joint-type masks — XLA sees a flat
    chain of fused elementwise ops and tiny (3,3) matmuls;
  * all topology-dependent reductions (composite inertias, mass-matrix
    sparsity, ancestor velocity sums) are baked into small constant 0/1
    matrices, so CRBA/RNE become a handful of dense einsums that batch
    perfectly under vmap/jacfwd;
  * model constants (body poses, inertias, joint axes) are snapshotted to
    numpy at plan build — they fold into the compiled program instead of
    being gathered from device arrays each step. (Rebuild the plan if the
    arm model's numeric parameters change.)

Measured effect (TPU v5e, B=256): generic `dynamics.step` on the arm
submodel costs ~0.42 ms/step inside a scan; this path is the difference
between 13 grasp-MPC solves/s and the thousands/s the north-star metric
(BASELINE.md) asks for.

Replaces the same reference boundary as dynamics.py: the `sim.step()` /
PID hot loop in /root/reference/gym_grasper/controller/MujocoController.py:
318-384, restricted to the arm the reference's planner also treats as
object-free (MujocoController.py:446-517).
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_rl_ur5_tpu.scene.mjcf import JNT_HINGE
from mujoco_rl_ur5_tpu.scene.model import Model


@dataclass(eq=False)  # identity hash -> usable as a static jit argument
class ChainPlan:
    """Static unrolled-chain schedule + baked numeric constants (numpy)."""

    nv: int
    nu: int
    nmov: int
    body_ids: np.ndarray        # (nmov,) compiled-model body id per slot
    parent_slot: np.ndarray     # (nmov,) parent slot, -1 = static parent
    parent_pose: np.ndarray     # (nmov, 3+9) static-parent world pos+rot
                                #  (only read where parent_slot == -1)
    body_pos: np.ndarray        # (nmov, 3) frame offset in parent
    body_rot: np.ndarray        # (nmov, 3, 3)
    jnt_dof: np.ndarray         # (nmov,) dof index of this body's hinge, -1
    jnt_pos: np.ndarray         # (nmov, 3) local joint anchor
    jnt_axis: np.ndarray        # (nmov, 3) local joint axis (unit)
    jnt_ref: np.ndarray         # (nmov,)
    dof_slot: np.ndarray        # (nv,) body slot per dof
    dof_parent_slot: np.ndarray  # (nv,) parent slot of the dof's body
    qadr: np.ndarray            # (nv,) qpos address per dof
    ipos: np.ndarray            # (nmov, 3)
    irot: np.ndarray            # (nmov, 3, 3) principal-axes rotation
    idiag: np.ndarray           # (nmov, 3)
    mass: np.ndarray            # (nmov,)
    damping: np.ndarray         # (nv,)
    armature: np.ndarray        # (nv,)
    act_dof: np.ndarray         # (nu,)
    gear: np.ndarray            # (nu,)
    ctrlrange: np.ndarray       # (nu, 2)
    org: np.ndarray             # (3,) spatial origin (root body rest pos)
    sub_body: np.ndarray        # (nmov, nmov) 1.0: col-body in subtree of row
    anc_dof: np.ndarray         # (nmov, nv) 1.0: dof moves this body
    dof_sub_body: np.ndarray    # (nv, nmov) 1.0: body in subtree of dof's body
    m_mask: np.ndarray          # (nv, nv) 1.0: dof j ancestor-or-self of dof i
    act_mat: np.ndarray         # (nv, nu) scatter matrix dofs<-actuators
    timestep: float
    gravity: np.ndarray         # (3,)
    # joint-coupling equalities as implicit springs (empty when the plan is
    # built with couple_equality=False): dof pairs, rest offsets, polycoef,
    # and (stiffness, damping) derived from solref + the effective inertia
    eq_d1: np.ndarray = None    # (neq,) constrained dof
    eq_d2: np.ndarray = None    # (neq,) driving dof
    eq_q01: np.ndarray = None   # (neq,) qpos0 of d1's joint
    eq_q02: np.ndarray = None   # (neq,)
    eq_poly: np.ndarray = None  # (neq, 5)
    eq_kc: np.ndarray = None    # (neq, 2) [k (N m/rad), c (N m s/rad)]


def _quat_to_mat_np(q: np.ndarray) -> np.ndarray:
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def make_chain_plan(model: Model, couple_equality: bool = True) -> ChainPlan:
    """Build the static plan; raises ValueError for non-chain models
    (any non-hinge joint, or >1 joint on a body).

    ``couple_equality`` bakes the model's joint-coupling equalities (the
    finger coupling base_to_rik = base_to_lik,
    UR5gripper_2_finger_many_objects.xml:340) as near-rigid implicit
    springs sized from solref and the joints' effective inertia — the
    contact-free analogue of the jointly-solved equality rows in
    physics/constraints.py. Without it the unactuated right knuckle never
    moves and the gripper dynamics diverge from MuJoCo's. Pass False to
    reproduce `dynamics.step(ncon=0)` exactly (which skips equality rows)."""
    t = model.topo
    if t.njnt == 0 or np.any(t.jnt_type != JNT_HINGE):
        raise ValueError("chain dynamics requires an all-hinge model")
    if np.any(t.body_jntnum > 1):
        raise ValueError("chain dynamics requires <= 1 joint per body")

    mov = np.nonzero(t.body_tree >= 0)[0]
    mov = np.array(sorted(mov))          # compiler ids are topological
    slot_of = {int(b): i for i, b in enumerate(mov)}
    nmov, nv, nu = len(mov), t.nv, t.nu

    m = lambda a: np.asarray(a, np.float64)
    body_pos = m(model.body_pos)[mov]
    body_rot = np.stack([_quat_to_mat_np(q) for q in m(model.body_quat)[mov]])

    parent_slot = np.full(nmov, -1, np.int64)
    parent_pose = np.zeros((nmov, 12))
    for i, b in enumerate(mov):
        p = int(t.body_parent[b])
        if p in slot_of:
            parent_slot[i] = slot_of[p]
        else:
            parent_pose[i, :3] = t.xpos0[p]
            parent_pose[i, 3:] = _quat_to_mat_np(t.xquat0[p]).reshape(-1)

    jnt_dof = np.full(nmov, -1, np.int64)
    jnt_pos = np.zeros((nmov, 3))
    jnt_axis = np.zeros((nmov, 3))
    jnt_ref = np.zeros(nmov)
    dof_slot = np.zeros(nv, np.int64)
    dof_parent_slot = np.zeros(nv, np.int64)
    for j in range(t.njnt):
        s = slot_of[int(t.jnt_body[j])]
        d = int(t.jnt_dofadr[j])
        jnt_dof[s] = d
        jnt_pos[s] = m(model.jnt_pos)[j]
        jnt_axis[s] = m(model.jnt_axis)[j]
        jnt_ref[s] = float(np.asarray(model.jnt_ref)[j])
        dof_slot[d] = s
        dof_parent_slot[d] = parent_slot[s]

    # ancestor closure over slots
    anc = np.zeros((nmov, nmov), bool)   # anc[s, a]: a is ancestor-or-self
    for i in range(nmov):
        s = i
        while s >= 0:
            anc[i, s] = True
            s = int(parent_slot[s])
    sub_body = anc.T.astype(np.float64)            # sub[s, b]: b in subtree
    anc_dof = np.zeros((nmov, nv))
    for s in range(nmov):
        for d in range(nv):
            if anc[s, dof_slot[d]]:
                anc_dof[s, d] = 1.0
    dof_sub_body = sub_body[dof_slot]              # (nv, nmov)
    m_mask = np.zeros((nv, nv))
    for i in range(nv):
        for j in range(nv):
            if anc[dof_slot[i], dof_slot[j]]:
                m_mask[i, j] = 1.0
    act_mat = np.zeros((nv, nu))
    act_mat[np.asarray(t.act_dofadr), np.arange(nu)] = 1.0

    # chain_step integrates qpos += h*qvel as a full-vector add, which
    # requires qpos/dof addresses to coincide; all-hinge models guarantee it,
    # assert so a relaxed validation above can't silently break integration
    qadr = np.asarray(t.jnt_qposadr)[np.argsort(t.jnt_dofadr)]
    assert np.array_equal(qadr, np.arange(nv)), \
        "chain plan requires qpos addresses == dof addresses (all-hinge)"

    root = int(t.tree_rootbody[0])
    plan = ChainPlan(
        nv=nv, nu=nu, nmov=nmov, body_ids=mov, parent_slot=parent_slot,
        parent_pose=parent_pose, body_pos=body_pos, body_rot=body_rot,
        jnt_dof=jnt_dof, jnt_pos=jnt_pos, jnt_axis=jnt_axis, jnt_ref=jnt_ref,
        dof_slot=dof_slot, dof_parent_slot=dof_parent_slot,
        qadr=qadr,
        ipos=m(model.body_ipos)[mov],
        irot=np.stack([_quat_to_mat_np(q) for q in m(model.body_iquat)[mov]]),
        idiag=m(model.body_inertia)[mov], mass=m(model.body_mass)[mov],
        damping=m(model.dof_damping), armature=m(model.dof_armature),
        act_dof=np.asarray(t.act_dofadr), gear=m(model.act_gear),
        ctrlrange=m(model.act_ctrlrange), org=np.array(t.xpos0[root]),
        sub_body=sub_body, anc_dof=anc_dof, dof_sub_body=dof_sub_body,
        m_mask=m_mask, act_mat=act_mat, timestep=float(t.timestep),
        gravity=np.asarray(t.gravity, np.float64),
        eq_d1=np.zeros(0, np.int64), eq_d2=np.zeros(0, np.int64),
        eq_q01=np.zeros(0), eq_q02=np.zeros(0),
        eq_poly=np.zeros((0, 5)), eq_kc=np.zeros((0, 2)),
    )
    if couple_equality and t.neq:
        # effective inertia of each coupled pair from the rest-pose mass
        # diagonal: m_eff = 1/(Minv[d1,d1] + dpoly^2 Minv[d2,d2]); then
        # MuJoCo-style impedance from solref (timeconst, dampratio):
        # k = m_eff / (dmax^2 tc^2), c = 2 m_eff dampratio / (dmax tc)
        q0 = jnp.asarray(np.asarray(model.qpos0, np.float64))
        M0, _ = chain_mass_bias(plan, q0, jnp.zeros((nv,), q0.dtype))
        M0 = np.asarray(M0)
        solref = np.asarray(model.eq_solref, np.float64)
        solimp = np.asarray(model.eq_solimp, np.float64)
        poly = np.asarray(model.eq_poly, np.float64)
        d1 = np.asarray(t.eq_j1_dof, np.int64)
        d2 = np.asarray(t.eq_j2_dof, np.int64)
        q01 = np.asarray(model.qpos0)[np.asarray(t.eq_j1_qadr)]
        q02 = np.asarray(model.qpos0)[np.asarray(t.eq_j2_qadr)]
        kc = np.zeros((t.neq, 2))
        for e in range(t.neq):
            x2 = 0.0                     # dpoly at rest (residual is 0 there)
            dp = poly[e, 1] + 2 * poly[e, 2] * x2 + 3 * poly[e, 3] * x2**2
            m_eff = 1.0 / (1.0 / M0[d1[e], d1[e]]
                           + dp * dp / M0[d2[e], d2[e]])
            tc, damp = float(solref[e, 0]), float(solref[e, 1])
            dmax = float(solimp[e, 1])
            # MuJoCo's soft constraint at impedance d = dmax: acceleration
            # stiffness 1/(dmax tc)^2 and damping 2 dampratio/(dmax tc),
            # both times the d/(1-d) impedance gain and m_eff. Empirically
            # checked against mujoco 3.x on the finger coupling: force
            # stiffness 255 N m/rad measured vs 263 predicted (quasi-static
            # close), and the c formula halves the fast-close trajectory
            # error vs a critical-damping guess (2.0e-3 vs 4.7e-3 rad MAE
            # on the knuckles over a recorded 512-step PID schedule).
            gain = m_eff * dmax / (1.0 - dmax)
            kc[e, 0] = gain / (dmax * dmax * tc * tc)
            kc[e, 1] = gain * 2.0 * damp / (dmax * tc)
        plan.eq_d1, plan.eq_d2 = d1, d2
        plan.eq_q01, plan.eq_q02 = np.asarray(q01), np.asarray(q02)
        plan.eq_poly, plan.eq_kc = poly, kc
    return plan


def _rodrigues(axis: np.ndarray, c, s):
    """Rotation matrix about a CONSTANT unit axis with traced cos/sin.
    R = c I + s [axis]_x + (1-c) axis axis^T — affine in (c, s)."""
    K = np.array([[0.0, -axis[2], axis[1]],
                  [axis[2], 0.0, -axis[0]],
                  [-axis[1], axis[0], 0.0]])
    aa = np.outer(axis, axis)
    eye = np.eye(3)
    return (c[..., None, None] * jnp.asarray(eye - aa, c.dtype)
            + s[..., None, None] * jnp.asarray(K, c.dtype)
            + jnp.asarray(aa, c.dtype))


def chain_fk(plan: ChainPlan, qpos: jax.Array):
    """Unrolled FK. Returns (xpos (nmov,3), xrot (nmov,3,3),
    anchor (nv,3), axis_w (nv,3)) — single scenario; vmap for batches."""
    f = qpos.dtype
    xpos, xrot = [], []
    anchor = [None] * plan.nv
    axis_w = [None] * plan.nv
    for i in range(plan.nmov):
        ps = int(plan.parent_slot[i])
        if ps >= 0:
            pp, pr = xpos[ps], xrot[ps]
            p_pre = pp + pr @ jnp.asarray(plan.body_pos[i], f)
            r_pre = pr @ jnp.asarray(plan.body_rot[i], f)
        else:
            # static parent: the whole pre-joint frame is a constant
            pr0 = plan.parent_pose[i, 3:].reshape(3, 3)
            p_pre = jnp.asarray(
                plan.parent_pose[i, :3] + pr0 @ plan.body_pos[i], f)
            r_pre = jnp.asarray(pr0 @ plan.body_rot[i], f)
        d = int(plan.jnt_dof[i])
        if d >= 0:
            th = qpos[int(plan.qadr[d])] - plan.jnt_ref[i]
            c, s = jnp.cos(th), jnp.sin(th)
            rj = _rodrigues(plan.jnt_axis[i], c, s)
            jp = jnp.asarray(plan.jnt_pos[i], f)
            anchor[d] = p_pre + r_pre @ jp
            p = p_pre + r_pre @ (jp - rj @ jp)
            r = r_pre @ rj
            axis_w[d] = r @ jnp.asarray(plan.jnt_axis[i], f)
        else:
            p, r = p_pre, r_pre
        xpos.append(p)
        xrot.append(r)
    return (jnp.stack(xpos), jnp.stack(xrot),
            jnp.stack(anchor), jnp.stack(axis_w))


def chain_body_pos(plan: ChainPlan, qpos: jax.Array, body_id: int) -> jax.Array:
    """World position of one body frame (e.g. ee_link) — differentiable."""
    slot = int(np.nonzero(plan.body_ids == body_id)[0][0])
    with jax.default_matmul_precision("float32"):
        xpos, _, _, _ = chain_fk(plan, qpos)
    return xpos[slot]


def chain_body_xaxis(plan: ChainPlan, qpos: jax.Array,
                     body_id: int) -> jax.Array:
    """World direction of one body frame's X axis — differentiable. For
    ee_link this is the gripper approach axis the reference's IK pins to
    [0, 0, -1] (MujocoController.py:498-500, orientation_mode="X")."""
    slot = int(np.nonzero(plan.body_ids == body_id)[0][0])
    with jax.default_matmul_precision("float32"):
        _, xrot, _, _ = chain_fk(plan, qpos)
    return xrot[slot][:, 0]


def chain_ee_geom(plan: ChainPlan, qpos: jax.Array, body_id: int):
    """EE position, frame X axis, and their GEOMETRIC Jacobians from ONE
    FK pass: J_pos[:, d] = z_d x (p_ee - anchor_d), J_axis[:, d] =
    z_d x x_ee for ancestor dofs d (zero otherwise). Equals
    jacfwd(chain_body_pos/chain_body_xaxis) (gated in tests/test_chain.py)
    at ~1/10 the cost: autodiff re-runs the FK with nv tangents, the
    geometric form reuses the primal FK's anchors and axes.

    Returns (p (3,), xaxis (3,), J_pos (3, nv), J_axis (3, nv))."""
    slot = int(np.nonzero(plan.body_ids == body_id)[0][0])
    f = qpos.dtype
    with jax.default_matmul_precision("float32"):
        xpos, xrot, anchor, ax = chain_fk(plan, qpos)
    p = xpos[slot]
    xa = xrot[slot][:, 0]
    mask = jnp.asarray(plan.anc_dof[slot], f)[:, None]      # (nv, 1)
    Jp = jnp.cross(ax, p[None, :] - anchor) * mask          # (nv, 3)
    Ja = jnp.cross(ax, xa[None, :]) * mask
    return p, xa, Jp.T, Ja.T


def _cdof_cinert(plan: ChainPlan, qpos: jax.Array):
    f = qpos.dtype
    xpos, xrot, anchor, ax = chain_fk(plan, qpos)
    org = jnp.asarray(plan.org, f)
    cdof = jnp.concatenate([ax, jnp.cross(anchor - org, ax)], -1)   # (nv, 6)

    # 10-parameter spatial inertia of each body about org
    ri = xrot @ jnp.asarray(plan.irot, f)                  # (nmov,3,3)
    icom = ri * jnp.asarray(plan.idiag, f)[:, None, :] @ jnp.swapaxes(ri, -1, -2)
    com = xpos + (xrot @ jnp.asarray(plan.ipos, f)[..., None])[..., 0]
    c = com - org
    mass = jnp.asarray(plan.mass, f)
    cc = c[:, :, None] * c[:, None, :]
    c2 = jnp.sum(c * c, -1)[:, None, None]
    iorg = icom + mass[:, None, None] * (c2 * jnp.eye(3, dtype=f) - cc)
    cinert = jnp.concatenate([
        mass[:, None], mass[:, None] * c,
        iorg[:, 0, 0, None], iorg[:, 1, 1, None], iorg[:, 2, 2, None],
        iorg[:, 0, 1, None], iorg[:, 0, 2, None], iorg[:, 1, 2, None],
    ], -1)                                                  # (nmov, 10)
    return cdof, cinert


def _imul(inert, v):
    """inertia_mul for stacked (…,10) x (…,6) (local copy keeps fusion tight)."""
    mass, h = inert[..., 0:1], inert[..., 1:4]
    w, vl = v[..., :3], v[..., 3:]
    iw = jnp.stack([
        inert[..., 4] * w[..., 0] + inert[..., 7] * w[..., 1] + inert[..., 8] * w[..., 2],
        inert[..., 7] * w[..., 0] + inert[..., 5] * w[..., 1] + inert[..., 9] * w[..., 2],
        inert[..., 8] * w[..., 0] + inert[..., 9] * w[..., 1] + inert[..., 6] * w[..., 2],
    ], -1)
    return jnp.concatenate([iw + jnp.cross(h, vl), mass * vl - jnp.cross(h, w)], -1)


def chain_mass_bias(plan: ChainPlan, qpos: jax.Array, qvel: jax.Array):
    """(M (nv,nv) incl. armature, qfrc_bias (nv,)) — CRBA + RNE as dense
    einsums over the baked topology masks."""
    f = qpos.dtype
    cdof, cinert = _cdof_cinert(plan, qpos)

    # CRBA: composite inertias via the subtree mask, then masked outer solve
    crb = jnp.asarray(plan.sub_body, f) @ cinert            # (nmov, 10)
    fmom = _imul(crb[plan.dof_slot], cdof)                  # (nv, 6)
    mfull = fmom @ cdof.T                                   # (nv, nv)
    mlow = jnp.asarray(plan.m_mask, f) * mfull
    mass = mlow + mlow.T - jnp.diag(jnp.diag(mlow)) \
        + jnp.diag(jnp.asarray(plan.armature, f))

    # RNE (qacc = 0): bias forces about org
    contrib = cdof * qvel[:, None]                          # (nv, 6)
    vbody = jnp.asarray(plan.anc_dof, f) @ contrib          # (nmov, 6)
    zero6 = jnp.zeros((6,), f)
    parent_v = jnp.stack([
        vbody[int(s)] if s >= 0 else zero6 for s in plan.dof_parent_slot])
    cdofdot = jnp.concatenate([
        jnp.cross(parent_v[:, :3], cdof[:, :3]),
        jnp.cross(parent_v[:, :3], cdof[:, 3:])
        + jnp.cross(parent_v[:, 3:], cdof[:, :3]),
    ], -1)
    a0 = jnp.concatenate([jnp.zeros(3, f), -jnp.asarray(plan.gravity, f)])
    abody = a0 + jnp.asarray(plan.anc_dof, f) @ (cdofdot * qvel[:, None])
    iv = _imul(cinert, vbody)
    fb = _imul(cinert, abody) + jnp.concatenate([
        jnp.cross(vbody[:, :3], iv[:, :3]) + jnp.cross(vbody[:, 3:], iv[:, 3:]),
        jnp.cross(vbody[:, :3], iv[:, 3:]),
    ], -1)
    fsub = jnp.asarray(plan.dof_sub_body, f) @ fb           # (nv, 6)
    bias = jnp.sum(cdof * fsub, -1)
    return mass, bias


def chain_hold_ctrl(plan: ChainPlan, qpos: jax.Array) -> jax.Array:
    """Gravity-compensation controls (iLQR warm start): bias/gear clipped."""
    f = qpos.dtype
    with jax.default_matmul_precision("float32"):
        _, bias = chain_mass_bias(plan, qpos, jnp.zeros((plan.nv,), f))
    u = bias[plan.act_dof] / jnp.asarray(plan.gear, f)
    return jnp.clip(u, jnp.asarray(plan.ctrlrange[:, 0], f),
                    jnp.asarray(plan.ctrlrange[:, 1], f))


def chain_step(plan: ChainPlan, qpos: jax.Array, qvel: jax.Array,
               ctrl: jax.Array):
    """One semi-implicit Euler step with implicit joint damping — same
    semantics as `dynamics.step(model, state, ncon=0)` on the submodel when
    the plan is built with couple_equality=False (parity-gated in
    tests/test_chain.py), plus the implicit equality springs otherwise
    (gated against ground-truth MuJoCo in the same file)."""
    from mujoco_rl_ur5_tpu.ops.blockchol import solve_spd_scaled

    with jax.default_matmul_precision("float32"):
        f = qpos.dtype
        h = plan.timestep
        mass, bias = chain_mass_bias(plan, qpos, qvel)
        c = jnp.clip(ctrl, jnp.asarray(plan.ctrlrange[:, 0], f),
                     jnp.asarray(plan.ctrlrange[:, 1], f))
        tau = jnp.asarray(plan.act_mat, f) @ (jnp.asarray(plan.gear, f) * c)
        damp = jnp.asarray(plan.damping, f)
        qfrc = tau - bias - damp * qvel
        a = mass + h * jnp.diag(damp)
        # joint-coupling equalities as implicit springs (plan docstring):
        # residual r = dq1 - poly(dq2), generalized force f = -(k r +
        # (h k + c_d) rdot) along G = e_d1 - dpoly e_d2; the velocity term
        # goes implicit exactly like the joint damping above
        for e in range(len(plan.eq_d1)):
            d1, d2 = int(plan.eq_d1[e]), int(plan.eq_d2[e])
            pc = plan.eq_poly[e]
            x2 = qpos[d2] - plan.eq_q02[e]
            poly = (pc[0] + pc[1] * x2 + pc[2] * x2**2 + pc[3] * x2**3
                    + pc[4] * x2**4)
            dpoly = (pc[1] + 2 * pc[2] * x2 + 3 * pc[3] * x2**2
                     + 4 * pc[4] * x2**3)
            r = (qpos[d1] - plan.eq_q01[e]) - poly
            rdot = qvel[d1] - dpoly * qvel[d2]
            k, cd = float(plan.eq_kc[e, 0]), float(plan.eq_kc[e, 1])
            g = jnp.zeros((plan.nv,), f).at[d1].set(1.0).at[d2].add(-dpoly)
            qfrc = qfrc - (k * r + (h * k + cd) * rdot) * g
            a = a + (h * (h * k + cd)) * jnp.outer(g, g)
        # equilibrated unrolled Cholesky solve (ops/blockchol.py): the
        # cho_factor/cho_solve custom-calls dominate the MPC rollout cost
        # on TPU at (.., 8, 8) shapes, and the arm mass needs Jacobi
        # scaling to stay accurate in f32 (cond ~1e7 from finger inertias)
        qacc = solve_spd_scaled(a, qfrc)
        qvel2 = qvel + h * qacc
        qpos2 = qpos + h * qvel2
        return qpos2, qvel2
