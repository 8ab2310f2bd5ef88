"""Batched smooth dynamics: CRBA mass blocks, RNE bias, implicit-damping Euler.

TPU-native replacement for MuJoCo's `mj_step` smooth pipeline, which the
reference crosses into once per 2 ms control tick
(/root/reference/gym_grasper/controller/MujocoController.py:379).

Key design choices (see scene/model.py docstring):
  * the mass matrix is built directly in per-kinematic-tree padded blocks
    ``(ntree, mtdof, mtdof)`` — never the dense (nv, nv) matrix; all scatter
    indices are compile-time constants, so XLA lowers CRBA to pure
    gather/einsum/scatter-add with a static schedule;
  * all spatial quantities live in world axes about per-tree origins
    (float32-friendly);
  * joint damping is integrated implicitly: v+ = v + h (M+hD)^-1 (f - Dv),
    matching MuJoCo's Euler integrator semantics.

Velocity-dependent conventions (ball/free joint velocities in body-local
coordinates, free translations in world) follow MuJoCo exactly so that
recorded mujoco trajectories can be used as golden tests.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_rl_ur5_tpu.ops.spatial import (
    force_cross, inertia_from_body, inertia_mul, motion_cross, quat_integrate,
    quat_mul,
)
from mujoco_rl_ur5_tpu.physics.kinematics import Kin, fk
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE
from mujoco_rl_ur5_tpu.scene.model import Model, State


# ---------------------------------------------------------------------------
# inertia pipeline
# ---------------------------------------------------------------------------


def com_inertia(model: Model, kin: Kin) -> jax.Array:
    """Per-body 10-parameter spatial inertia about the body's tree origin."""
    t = model.topo
    offset = kin.xipos - kin.body_org
    iquat_w = quat_mul(kin.xquat, model.body_iquat)
    cinert = inertia_from_body(model.body_mass, model.body_inertia, offset, iquat_w)
    # zero out static bodies (their inertia never enters tree dynamics)
    moving = jnp.asarray((t.body_tree >= 0), cinert.dtype)[:, None]
    return cinert * moving


def composite_inertia(model: Model, cinert: jax.Array) -> jax.Array:
    """Accumulate subtree composite inertias bottom-up (CRB)."""
    t = model.topo
    crb = cinert
    for level in reversed(t.body_levels):
        pid = t.body_parent[level]
        # only accumulate into moving parents; world/static parents dropped
        pid_sc = np.where(t.body_tree[pid] >= 0, pid, t.nbody)
        crb = crb.at[pid_sc].add(crb[level])
    return crb


def mass_blocks(model: Model, kin: Kin, crb: jax.Array) -> jax.Array:
    """CRBA -> per-tree padded mass blocks (ntree, mtdof, mtdof)."""
    t = model.topo
    mt = t.mtdof
    f = inertia_mul(crb[t.dof_body], kin.cdof)            # (nv, 6)
    anc = t.dof_ancestors                                  # (nv, mt) static
    cdof_anc = kin.cdof[np.maximum(anc, 0)]                # (nv, mt, 6)
    vals = jnp.einsum("nk,nmk->nm", f, cdof_anc)           # (nv, mt)
    # static flat scatter indices: blocks[tree, idx_i, idx_j]
    idx_i = t.dof_treeidx[:, None]                         # (nv, 1)
    idx_j = np.where(anc >= 0, t.dof_treeidx[np.maximum(anc, 0)], 0)
    flat = t.dof_tree[:, None] * mt * mt + idx_i * mt + idx_j
    flat = np.where(anc >= 0, flat, t.ntree * mt * mt)     # pad -> dropped
    blocks = jnp.zeros((t.ntree * mt * mt,), vals.dtype).at[flat.reshape(-1)].add(
        vals.reshape(-1)
    )
    blocks = blocks.reshape(t.ntree, mt, mt)
    # lower triangle (ancestors precede descendants) -> symmetrize
    eye = jnp.eye(mt, dtype=vals.dtype)
    blocks = blocks + jnp.swapaxes(blocks, -1, -2) * (1.0 - eye)
    # armature on the diagonal + unit diagonal on padding slots
    diag_flat = t.dof_tree * mt * mt + t.dof_treeidx * mt + t.dof_treeidx
    pad = jnp.ones((t.ntree * mt * mt,), vals.dtype) * 0.0
    arm = pad.at[diag_flat].add(model.dof_armature).reshape(t.ntree, mt, mt)
    used = np.zeros((t.ntree, mt), dtype=bool)
    used[t.dof_tree, t.dof_treeidx] = True
    pad_diag = jnp.asarray(~used, vals.dtype)[:, :, None] * eye
    return blocks + arm + pad_diag


# ---------------------------------------------------------------------------
# velocities + RNE bias
# ---------------------------------------------------------------------------


def com_vel(model: Model, kin: Kin, qvel: jax.Array):
    """Body spatial velocities + cdof time-derivatives (MuJoCo conventions)."""
    t = model.topo
    contrib = kin.cdof * qvel[:, None]                      # (nv, 6)
    bodysum = jax.ops.segment_sum(contrib, t.dof_body, num_segments=t.nbody)
    cvel = jnp.zeros((t.nbody, 6), qvel.dtype)
    for level in t.body_levels:
        cvel = cvel.at[level].set(cvel[t.body_parent[level]] + bodysum[level])

    # partial velocity per dof: v[parent(body)] + same-body dofs below threshold
    # threshold: start of own joint (hinge/slide/ball), +3 for free rotation
    thresh = np.zeros(t.nv, dtype=np.int32)
    for d in range(t.nv):
        j = t.dof_jnt[d]
        thr = t.jnt_dofadr[j]
        if t.jnt_type[j] == JNT_FREE and d >= t.jnt_dofadr[j] + 3:
            thr = t.jnt_dofadr[j] + 3
        thresh[d] = thr
    # same-body dof inclusion mask (static, nv x nv is fine at nv<=256? use
    # per-dof gather over body's dofs instead: mtdof bound)
    mt = t.mtdof
    anc = t.dof_ancestors
    same_body = np.where(anc >= 0, t.dof_body[np.maximum(anc, 0)] == t.dof_body[:, None], False)
    include = same_body & (anc < thresh[:, None]) & (anc >= 0)
    pre = jnp.einsum(
        "nm,nmk->nk", jnp.asarray(include, qvel.dtype), contrib[np.maximum(anc, 0)]
    )
    parent_v = cvel[t.body_parent[t.dof_body]]
    partial = parent_v + pre
    cdofdot = motion_cross(partial, kin.cdof)
    # free translational dofs: cdof constant in world -> zero derivative
    freedofs = []
    for j in np.nonzero(t.jnt_type == JNT_FREE)[0]:
        freedofs.extend(range(int(t.jnt_dofadr[j]), int(t.jnt_dofadr[j]) + 3))
    if freedofs:
        cdofdot = cdofdot.at[np.array(freedofs)].set(0.0)
    return cvel, cdofdot


def rne_bias(model: Model, kin: Kin, cinert: jax.Array, qvel: jax.Array) -> jax.Array:
    """qfrc_bias = C(q, v) + gravity terms (MuJoCo mj_rne with qacc = 0)."""
    t = model.topo
    cvel, cdofdot = com_vel(model, kin, qvel)
    # bias accelerations: base 'accelerates' upward at -g
    grav = jnp.asarray(t.gravity, qvel.dtype)
    a0 = jnp.concatenate([jnp.zeros(3, qvel.dtype), -grav])
    acc_contrib = cdofdot * qvel[:, None]
    accsum = jax.ops.segment_sum(acc_contrib, t.dof_body, num_segments=t.nbody)
    cacc = jnp.broadcast_to(a0, (t.nbody, 6))
    for level in t.body_levels:
        cacc = cacc.at[level].set(cacc[t.body_parent[level]] + accsum[level])
    # body forces
    fb = inertia_mul(cinert, cacc) + force_cross(cvel, inertia_mul(cinert, cvel))
    # accumulate up
    ftot = fb
    for level in reversed(t.body_levels):
        pid = t.body_parent[level]
        pid_sc = np.where(t.body_tree[pid] >= 0, pid, t.nbody)
        ftot = ftot.at[pid_sc].add(ftot[level])
    return jnp.einsum("nk,nk->n", kin.cdof, ftot[t.dof_body])


# ---------------------------------------------------------------------------
# block solves
# ---------------------------------------------------------------------------


def factor_blocks(blocks: jax.Array) -> jax.Array:
    """Per-tree Cholesky factors via the unrolled small-block kernel.

    ``jnp.linalg.cholesky`` lowers to a TPU custom-call costing ~8.5 ms at
    (256*41, 8, 8) — profiled at ~30% of the whole contact step; the
    unrolled version fuses into a few VPU kernels (ops/blockchol.py)."""
    from mujoco_rl_ur5_tpu.ops.blockchol import chol_small

    return chol_small(blocks)


def solve_blocks(model: Model, chol: jax.Array, vec: jax.Array) -> jax.Array:
    """x = M^-1 vec using the per-tree Cholesky factors."""
    from mujoco_rl_ur5_tpu.ops.blockchol import cho_solve_small

    t = model.topo
    mt = t.mtdof
    v = jnp.zeros((t.ntree, mt), vec.dtype).at[t.dof_tree, t.dof_treeidx].set(vec)
    x = cho_solve_small(chol, v[..., None])[..., 0]
    return x[t.dof_tree, t.dof_treeidx]


def inv_blocks(blocks: jax.Array) -> jax.Array:
    """Explicit per-tree M^-1 blocks. Constraint solving applies M^-1
    hundreds of times per step (Delassus blocks, every solver iteration);
    one explicit inverse turns all of those into einsums on the MXU instead
    of triangular-solve custom-calls.

    The inversion is Jacobi-EQUILIBRATED: the arm tree block mixes ~20 kg
    link masses with ~1e-6 kg m^2 finger inertias (cond ~1e7), and a plain
    f32 explicit inverse carries O(cond * eps) ~ O(1) relative error — it
    destabilized the contact solver after pile settling (exponential
    velocity blowup ~step 800, seen in the verify drive). Inverting
    D^-1/2 M D^-1/2 (cond ~1e2) and unscaling keeps every entry accurate.
    """
    from mujoco_rl_ur5_tpu.ops.blockchol import chol_small, cho_solve_small

    mt = blocks.shape[-1]
    d = jnp.diagonal(blocks, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    scaled = blocks * s[..., :, None] * s[..., None, :]
    eye = jnp.broadcast_to(jnp.eye(mt, dtype=blocks.dtype), blocks.shape)
    inv_scaled = cho_solve_small(chol_small(scaled), eye)
    return inv_scaled * s[..., :, None] * s[..., None, :]


def minv_apply(model: Model, minv: jax.Array, vec: jax.Array) -> jax.Array:
    """x = M^-1 vec using the explicit per-tree inverse blocks."""
    t = model.topo
    mt = t.mtdof
    v = jnp.zeros((t.ntree, mt), vec.dtype).at[t.dof_tree, t.dof_treeidx].set(vec)
    x = jnp.einsum("tij,tj->ti", minv, v)
    return x[t.dof_tree, t.dof_treeidx]


# ---------------------------------------------------------------------------
# actuation / passive / integration
# ---------------------------------------------------------------------------


def actuator_force(model: Model, ctrl: jax.Array) -> jax.Array:
    """Torque-motor actuators: qfrc[dof] += gear * clip(ctrl, ctrlrange).

    Parity: the 7 gear-101 motors of the reference scenes
    (UR5gripper_2_finger.xml:347-357)."""
    t = model.topo
    c = jnp.clip(ctrl, model.act_ctrlrange[:, 0], model.act_ctrlrange[:, 1])
    force = model.act_gear * c
    return jnp.zeros(t.nv, ctrl.dtype).at[t.act_dofadr].add(force)


def passive_force(model: Model, qvel: jax.Array) -> jax.Array:
    """Explicit passive forces (damping handled implicitly in the integrator)."""
    return jnp.zeros_like(qvel)


def integrate_qpos(model: Model, qpos: jax.Array, qvel: jax.Array, h) -> jax.Array:
    """qpos += h * qvel with quaternion handling per joint type."""
    t = model.topo
    out = qpos
    r3, r4 = np.arange(3), np.arange(4)
    scal = np.nonzero((t.jnt_type == JNT_HINGE) | (t.jnt_type == JNT_SLIDE))[0]
    if len(scal):
        out = out.at[t.jnt_qposadr[scal]].add(h * qvel[t.jnt_dofadr[scal]])
    ball = np.nonzero(t.jnt_type == JNT_BALL)[0]
    if len(ball):
        qa, da = t.jnt_qposadr[ball], t.jnt_dofadr[ball]
        q = quat_integrate(qpos[qa[:, None] + r4], qvel[da[:, None] + r3], h)
        out = out.at[qa[:, None] + r4].set(q)
    fj = np.nonzero(t.jnt_type == JNT_FREE)[0]
    if len(fj):
        qa, da = t.jnt_qposadr[fj], t.jnt_dofadr[fj]
        out = out.at[qa[:, None] + r3].add(h * qvel[da[:, None] + r3])
        q = quat_integrate(qpos[qa[:, None] + 3 + r4], qvel[da[:, None] + 3 + r3], h)
        out = out.at[qa[:, None] + 3 + r4].set(q)
    return out


# ---------------------------------------------------------------------------
# forward + step
# ---------------------------------------------------------------------------


def forward(model: Model, state: State, ncon: int = 0, iterations: int = 30):
    """Forward dynamics incl. constraints; returns (qacc, kin, contacts).

    ``ncon`` is the static active-contact cap (0 disables contacts entirely —
    equality/limit rows are then also skipped, giving pure smooth dynamics).
    The constraint solve runs against M (MuJoCo convention); integration uses
    M + h*diag(damping).

    All matmuls/einsums in the pipeline (including the one-hot table
    lookups in the contact solver) run at float32 matmul precision: the
    TPU default lowers f32 dots to single-pass bf16, which would quantize
    positions fetched through one-hot matmuls by ~0.4% (millimetres at
    workspace scale) and inject like-sized errors into contact forces.
    """
    qacc, kin, contacts, _ = forward_warm(model, state, None, ncon,
                                          iterations)
    return qacc, kin, contacts


def forward_warm(model: Model, state: State, warm, ncon: int = 0,
                 iterations: int = 30):
    """`forward` with constraint-solver warm starting: pass the previous
    step's warm pytree (constraints.init_warm for the first step); returns
    (qacc, kin, contacts, warm'). Warm starting is what lets stiff
    persistent contacts (two-finger pinches) build up to their stall
    forces across steps — see constraints.constraint_forces."""
    with jax.default_matmul_precision("float32"):
        return _forward_impl(model, state, ncon, iterations, warm)


def _forward_impl(model: Model, state: State, ncon: int, iterations: int,
                  warm=None):
    t = model.topo
    h = t.timestep
    kin = fk(model, state.qpos)
    cinert = com_inertia(model, kin)
    crb = composite_inertia(model, cinert)
    mblocks = mass_blocks(model, kin, crb)
    # implicit damping: MhB = M + h * diag(damping)
    mt = t.mtdof
    dflat = (
        jnp.zeros((t.ntree * mt * mt,), state.qvel.dtype)
        .at[t.dof_tree * mt * mt + t.dof_treeidx * mt + t.dof_treeidx]
        .add(h * model.dof_damping)
        .reshape(t.ntree, mt, mt)
    )
    chol_mhb = factor_blocks(mblocks + dflat)
    bias = rne_bias(model, kin, cinert, state.qvel)
    qfrc_smooth = (
        actuator_force(model, state.ctrl)
        + passive_force(model, state.qvel)
        - bias
        - model.dof_damping * state.qvel
    )
    qfrc_constraint = 0.0
    contacts = None
    warm_new = warm
    if ncon > 0:
        from mujoco_rl_ur5_tpu.physics.constraints import constraint_forces

        minv = inv_blocks(mblocks)
        qacc_smooth = minv_apply(model, minv, qfrc_smooth)
        qfrc_constraint, contacts, warm_new = constraint_forces(
            model, state, kin, minv, qacc_smooth, ncon, iterations,
            warm=warm
        )
    qacc = solve_blocks(model, chol_mhb, qfrc_smooth + qfrc_constraint)
    return qacc, kin, contacts, warm_new


def step(model: Model, state: State, ncon: int = 0, iterations: int = 30) -> State:
    """One semi-implicit Euler step (single scenario; vmap for batches)."""
    state, _ = step_warm(model, state, None, ncon=ncon,
                         iterations=iterations)
    return state


def step_warm(model: Model, state: State, warm, ncon: int = 0,
              iterations: int = 30):
    """One step with constraint warm starting; returns (State, warm').
    Thread warm' through step loops (controller moves, env phases, MPC
    plan execution) so persistent-contact forces accumulate like MuJoCo's
    warmstarted solver; start from constraints.init_warm (or None for a
    cold start)."""
    h = model.topo.timestep
    qacc, _, _, warm_new = forward_warm(model, state, warm, ncon=ncon,
                                        iterations=iterations)
    qvel = state.qvel + h * qacc
    qpos = integrate_qpos(model, state.qpos, qvel, h)
    return (state.replace(qpos=qpos, qvel=qvel, time=state.time + h),
            warm_new)
