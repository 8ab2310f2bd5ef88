"""Soft-constraint solver: contacts + joint limits + equality couplings.

TPU-native re-design of MuJoCo's constraint pipeline (the engine behind every
`sim.step()` the reference makes). MuJoCo solves a convex program per step
with sequential PGS/Newton; here the dual problem

    min_{f in K}  0.5 f^T (A + R) f + f^T (J qacc_smooth - aref)

(A = J M^-1 J^T the Delassus operator, R the soft-constraint regularizer,
K the product of friction cones / nonnegative orthants / free spaces) is
solved with a *parallel* block-preconditioned projected-gradient iteration:
every contact owns an exact 6x6 Delassus diagonal block (einsums against
the explicit Jacobi-equilibrated per-tree M^-1 from dynamics.inv_blocks),
and all contacts update simultaneously — no sequential sweep, so the whole
solver is a fixed unrolled loop of dense batched einsums (MXU work, no
gathers/scatters/custom-calls) that vmaps over 4096 scenarios.

Soft-constraint parameters follow MuJoCo exactly:
    impedance d(r) from solimp (dmin, dmax, width, mid=0.5, power=2)
    b = 2/(dmax*timeconst),  k = 1/(dmax^2*timeconst^2*dampratio^2)
    aref = -b * (J qvel) - k * imp * r,   R = (1-imp)/imp * diag(A)
with friction rows regularized 1/impratio as tightly as normal rows
(UR5gripper_2_finger_many_objects.xml:22 sets impratio=10).

Equality couplings (the finger joint base_to_rik = base_to_lik) and joint
limits are scalar rows solved JOINTLY with the contacts in the same
program — required for force balance: the second gripper finger is driven
ONLY through the equality row, so a decoupled post-pass underestimates
pinch forces several-fold and drops grasps (fixed in round 2; gated by
tests/test_grasp_parity.py).

Known deviation: we project onto the exact elliptic (circular) Coulomb
cone; MuJoCo's default is the pyramidal facet approximation, which can
generate somewhat larger effective normal forces when friction saturates.
Grasp outcomes are gated against MuJoCo behaviorally, not force-for-force.

Memory is bounded by selecting the ncon most-penetrating candidate points
per scenario with a global top-k (the static analogue of nconmax=1500).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_rl_ur5_tpu.ops.spatial import quat_mul, quat_rotate
from mujoco_rl_ur5_tpu.physics import collision, pallas_collide
from mujoco_rl_ur5_tpu.physics.kinematics import Kin, geom_poses
from mujoco_rl_ur5_tpu.scene.model import Model, State


# ---------------------------------------------------------------------------
# soft-constraint scalar model
# ---------------------------------------------------------------------------


def impedance(solimp: jax.Array, r: jax.Array) -> jax.Array:
    """MuJoCo solimp sigmoid: (dmin, dmax, width) with mid=0.5, power=2."""
    dmin, dmax, width = solimp[..., 0], solimp[..., 1], solimp[..., 2]
    mid, power = 0.5, 2.0
    x = jnp.clip(jnp.abs(r) / jnp.maximum(width, 1e-12), 0.0, 1.0)
    a = 1.0 / mid ** (power - 1.0)
    y = jnp.where(
        x <= mid,
        a * x ** power,
        1.0 - ((1.0 - x) ** power) / (1.0 - mid) ** (power - 1.0),
    )
    return jnp.clip(dmin + y * (dmax - dmin), 1e-4, 1.0 - 1e-6)


def kb_from_solref(solref: jax.Array, dmax: jax.Array):
    """Stiffness/damping of the virtual constraint spring."""
    tc = jnp.maximum(solref[..., 0], 1e-6)
    dr = jnp.maximum(solref[..., 1], 1e-6)
    b = 2.0 / (dmax * tc)
    k = 1.0 / (dmax * dmax * tc * tc * dr * dr)
    return k, b


# ---------------------------------------------------------------------------
# candidate collision + selection
# ---------------------------------------------------------------------------


def _onehot_np(idx: np.ndarray, n: int, dtype) -> np.ndarray:
    """Constant one-hot matrix (len(idx), n) for static gather-as-matmul."""
    oh = np.zeros((len(idx), n), dtype=np.dtype(dtype))
    oh[np.arange(len(idx)), np.asarray(idx)] = 1.0
    return oh


BROADPHASE_CAP = 64   # max pairs per type group fed to the narrowphase


def collide(model: Model, kin: Kin):
    """Run all narrowphase groups -> flat candidate arrays (static shapes).

    Broadphase: groups with more than BROADPHASE_CAP candidate pairs are
    pruned to the CAP nearest by bounding-sphere separation before the
    (expensive) narrowphase — a static top-k, so shapes stay fixed. The
    grasp scene has 2,237 static pairs (571 box-hull alone); at any instant
    well under 64 per group can touch, so the prune is behavior-neutral
    while cutting narrowphase+selection work ~4x (a fully dense
    no-broadphase variant measured 3x SLOWER end-to-end: the global
    most-penetrating top-k then runs over ~12k candidates).

    TPU note: per-pair operands of BATCHED tables (geom poses, hull data
    under batched selection) are fetched by one-hot matmuls, never row
    gathers — constant one-hots (numpy) for static pair lists, iota-compare
    one-hots for the top-k-selected pairs. Row gathers on TPU are VMEM-bound
    serial loops (profiled ~15 ms/step at B=256 here); the matmuls ride the
    MXU at <1 ms. Per-pair CONSTANTS (margins, friction, solref/solimp,
    geom ids) travel as a packed (n, 13) float block: constant for uncapped
    groups, one small `sel_onehot @ const` matmul for capped ones. (A
    previous design carried (ncand, npair) one-hot rows instead — a
    B x 2764 x 2237 tensor that OOM'd HBM at B=1024.)

    Returns (pos (ncand,3), normal (ncand,3), dist (ncand,), pdata
    (ncand, 13)) with pdata columns [pairidx, margin, friction*3, solref*2,
    solimp*3, condim, geom1, geom2]."""
    t = model.topo
    dtype = kin.xpos.dtype
    gpos, gquat = geom_poses(model, kin)
    cpos = gpos + quat_rotate(gquat, model.col_pos)
    cquat = quat_mul(gquat, model.col_quat)
    rbound = model.geom_rbound

    # packed per-pair constants (host-side; model pair tables are unbatched)
    pdata_all = np.column_stack([
        np.arange(len(t.pair_geom1), dtype=np.float64),
        np.asarray(model.pair_margin, np.float64),
        np.asarray(model.pair_friction, np.float64),
        np.asarray(model.pair_solref, np.float64),
        np.asarray(model.pair_solimp, np.float64),
        np.asarray(t.pair_condim, np.float64),
        np.asarray(t.pair_geom1, np.float64),
        np.asarray(t.pair_geom2, np.float64),
    ]).astype(np.dtype(dtype))

    pos_l, n_l, dist_l, pdata_l = [], [], [], []
    for (t1, t2, idx) in t.pair_groups:
        idx = np.asarray(idx)
        g1 = np.asarray(t.pair_geom1)[idx]
        g2 = np.asarray(t.pair_geom2)[idx]
        P1 = jnp.asarray(_onehot_np(g1, t.ngeom, dtype))   # (n, ngeom)
        P2 = jnp.asarray(_onehot_np(g2, t.ngeom, dtype))
        pd = jnp.asarray(pdata_all[idx])                   # (n, 13) const
        if len(idx) > BROADPHASE_CAP:
            c1, c2 = P1 @ cpos, P2 @ cpos
            sep = (jnp.linalg.norm(c1 - c2, axis=-1)
                   - P1 @ rbound - P2 @ rbound)
            _, sel = jax.lax.top_k(-sep, BROADPHASE_CAP)
            S = jax.nn.one_hot(sel, len(idx), dtype=dtype)  # (cap, n)
            P1, P2, pd = S @ P1, S @ P2, S @ pd
        p1, q1, s1 = P1 @ cpos, P1 @ cquat, P1 @ model.col_size
        p2, q2, s2 = P2 @ cpos, P2 @ cquat, P2 @ model.col_size
        if (t1, t2) in collision.NARROWPHASE:
            _, k = collision.NARROWPHASE[(t1, t2)]
            # custom_vmap dispatch: the reference jnp path per-scenario /
            # off-TPU, the batch-in-lanes Pallas kernel under the scenario
            # vmap on TPU (physics/pallas_collide.py)
            p, n, d = pallas_collide.dispatch(t1, t2, p1, q1, s1, p2, q2, s2)
        else:
            _, k = collision.HULL_NARROWPHASE[(t1, t2)]
            # geom -> mesh-slot one-hot composed through the pair one-hot
            g2m = _onehot_np(
                np.maximum(np.asarray(t.geom_meshid), 0), t.nmesh, dtype)
            H2 = P2 @ jnp.asarray(g2m)                     # (n, nmesh)
            h2 = (jnp.einsum("pm,mvd->pvd", H2, model.hull_verts),
                  H2 @ model.hull_vmask,
                  jnp.einsum("pm,mfd->pfd", H2, model.hull_fnorm),
                  H2 @ model.hull_fdist)
            if t1 == collision.GEOM_MESH:
                H1 = P1 @ jnp.asarray(g2m)
                p, n, d = pallas_collide.dispatch_hull(
                    t1,
                    p1, q1,
                    jnp.einsum("pm,mvd->pvd", H1, model.hull_verts),
                    H1 @ model.hull_vmask,
                    jnp.einsum("pm,mfd->pfd", H1, model.hull_fnorm),
                    H1 @ model.hull_fdist,
                    p2, q2, *h2,
                )
            else:
                p, n, d = pallas_collide.dispatch_hull(
                    t1, p1, q1, s1, p2, q2, *h2)
        pos_l.append(p.reshape(-1, 3))
        n_l.append(n.reshape(-1, 3))
        dist_l.append(d.reshape(-1))
        pdata_l.append(jnp.repeat(pd, k, axis=0))
    if not pos_l:
        z = jnp.zeros((0, 3))
        return z, z, jnp.zeros((0,)), jnp.zeros((0, 13))
    return (
        jnp.concatenate(pos_l),
        jnp.concatenate(n_l),
        jnp.concatenate(dist_l),
        jnp.concatenate(pdata_l),         # (ncand, 13) packed pair data
    )


@struct.dataclass
class ContactSet:
    """Top-ncon selected contacts with block Jacobians (single scenario)."""

    pos: jax.Array       # (K, 3)
    frame: jax.Array     # (K, 3, 3) rows: normal, tangent1, tangent2
    dist: jax.Array      # (K,) signed distance
    active: jax.Array    # (K,) bool
    dim_mask: jax.Array  # (K, 6) active cone components
    friction: jax.Array  # (K, 3)
    solref: jax.Array    # (K, 2)
    solimp: jax.Array    # (K, 3)
    margin: jax.Array    # (K,)
    tree1: jax.Array     # (K,) int32 (== ntree for static side)
    tree2: jax.Array     # (K,)
    J1: jax.Array        # (K, 6, mtdof) side-1 rows (already negated)
    J2: jax.Array        # (K, 6, mtdof)
    geom1: jax.Array     # (K,)
    geom2: jax.Array     # (K,)
    sel: jax.Array = None  # (K,) int32 candidate index of each contact
                           # (stable per (pair, point) slot: warm-start key)
    forces: jax.Array = None  # (K, 6) solved cone impulses (diagnostics;
                              # filled by constraint_forces)


def _tangent_frame(n):
    """Orthonormal (t1, t2) complement of unit normal n (branch-free)."""
    ref = jnp.where(jnp.abs(n[..., 2:3]) < 0.7,
                    jnp.array([0.0, 0, 1], n.dtype),
                    jnp.array([1.0, 0, 0], n.dtype))
    t1 = jnp.cross(n, ref)
    t1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-12)
    t2 = jnp.cross(n, t1)
    return t1, t2


def make_contacts(model: Model, kin: Kin, ncon: int) -> ContactSet:
    t = model.topo
    cand_pos, cand_n, cand_dist, cand_pd = collide(model, kin)
    dtype = cand_pos.dtype
    score = cand_dist - cand_pd[:, 1]                 # dist - margin
    ncand = cand_pd.shape[0]
    k = min(ncon, ncand)
    _, sel = jax.lax.top_k(-score, k)
    S = jax.nn.one_hot(sel, ncand, dtype=dtype)       # (k, ncand)

    pos = S @ cand_pos
    n = S @ cand_n
    dist = S @ cand_dist
    pd = S @ cand_pd                                  # (k, 13) pair data
    margin = pd[:, 1]
    friction = pd[:, 2:5]
    solref = pd[:, 5:7]
    solimp = pd[:, 7:10]
    condim = pd[:, 10]
    g1 = jnp.rint(pd[:, 11]).astype(jnp.int32)
    g2 = jnp.rint(pd[:, 12]).astype(jnp.int32)
    active = (dist - margin) < 0.0

    Tg1 = jax.nn.one_hot(g1, t.ngeom, dtype=dtype)    # (k, ngeom)
    Tg2 = jax.nn.one_hot(g2, t.ngeom, dtype=dtype)
    dim_mask = jnp.arange(6) < condim[:, None]
    t1v, t2v = _tangent_frame(n)
    frame = jnp.stack([n, t1v, t2v], axis=1)

    # cdof regrouped per (tree, slot); extra zero tree for static sides.
    # All per-contact table reads go through one-hot matmuls: TPU row
    # gathers at (K,) dynamic indices are VMEM-bound serial loops, while
    # (K, ntree+1) x (ntree+1, mt*6) one-hots ride the MXU (profiled ~5x).
    cdof_tree = jnp.zeros((t.ntree + 1, t.mtdof, 6), dtype)
    cdof_tree = cdof_tree.at[t.dof_tree, t.dof_treeidx].set(kin.cdof)
    tree_org = jnp.concatenate([kin.tree_org, jnp.zeros((1, 3), dtype)])
    b_tree = np.where(t.body_tree >= 0, t.body_tree, t.ntree)
    b_slots = jnp.asarray(t.body_ancestor_slots, dtype)
    geom_tree_np = b_tree[t.geom_body]                  # (ngeom,) host ints
    geom_slots = b_slots[np.asarray(t.geom_body)]       # (ngeom, mt)
    geom_slots = geom_slots * jnp.asarray(
        (geom_tree_np != t.ntree)[:, None], dtype)
    # geom -> tree one-hot (constant): composes with Tg for tree lookups
    GTc = jnp.asarray(_onehot_np(geom_tree_np, t.ntree + 1, dtype))

    def side_jac(Tg, pos, frame):
        """Batched contact-side Jacobian rows from the geom one-hot
        Tg (K, ngeom), pos (K,3), frame (K,3,3) -> (tree (K,), J (K,6,mt))."""
        Tt = Tg @ GTc                                    # (K, ntree+1)
        tr = (Tt @ jnp.arange(t.ntree + 1, dtype=dtype)).astype(jnp.int32)
        cd = jnp.einsum("kt,tmf->kmf", Tt, cdof_tree)    # (K, mt, 6)
        org = Tt @ tree_org                              # (K, 3)
        slots = Tg @ geom_slots                          # (K, mt)
        ang = cd[..., :3]
        lin = cd[..., 3:] + jnp.cross(ang, (pos - org)[:, None, :])
        Jlin = jnp.einsum("krd,kmd->krm", frame, lin)    # (K, 3, mt)
        Jang = jnp.einsum("krd,kmd->krm", frame, ang)
        J = jnp.concatenate([Jlin, Jang], axis=1) * slots[:, None, :]
        return tr, J

    tree1, J1 = side_jac(Tg1, pos, frame)
    J1 = -J1
    tree2, J2 = side_jac(Tg2, pos, frame)

    return ContactSet(
        pos=pos, frame=frame, dist=dist, active=active, dim_mask=dim_mask,
        friction=friction, solref=solref, solimp=solimp, margin=margin,
        tree1=tree1, tree2=tree2, J1=J1, J2=J2, geom1=g1, geom2=g2,
        sel=sel,
    )


# ---------------------------------------------------------------------------
# joint-space helpers (equality / limit rows live on single dofs)
# ---------------------------------------------------------------------------


def _dof_row(t, d):
    """(tree, slot-one-hot row of length mtdof) for a scalar dof id (static)."""
    row = np.zeros(t.mtdof)
    row[t.dof_treeidx[d]] = 1.0
    return int(t.dof_tree[d]), row


# ---------------------------------------------------------------------------
# the solver
# ---------------------------------------------------------------------------


def _scalar_rows(model: Model, state: State):
    """Equality + joint-limit rows as dense (S, nv) Jacobians with their
    aref/solimp data. These are solved JOINTLY with the contacts: the finger
    coupling (base_to_rik = base_to_lik) is the only drive path to the
    second finger, so solving it outside the contact program (round 1's
    post-pass) underestimated pinch forces ~5x and dropped grasps."""
    t = model.topo
    dtype = state.qvel.dtype
    J_rows, pos_terms, vel_terms, solrefs, solimps, lower_bounded = \
        [], [], [], [], [], []
    for e in range(t.neq):
        d1, d2 = int(t.eq_j1_dof[e]), int(t.eq_j2_dof[e])
        q1 = state.qpos[t.eq_j1_qadr[e]] - model.qpos0[t.eq_j1_qadr[e]]
        q2 = state.qpos[t.eq_j2_qadr[e]] - model.qpos0[t.eq_j2_qadr[e]]
        c = model.eq_poly[e]
        poly = c[0] + c[1] * q2 + c[2] * q2**2 + c[3] * q2**3 + c[4] * q2**4
        dpoly = c[1] + 2 * c[2] * q2 + 3 * c[3] * q2**2 + 4 * c[4] * q2**3
        row = jnp.zeros(t.nv, dtype).at[d1].set(1.0).at[d2].add(-dpoly)
        J_rows.append(row)
        pos_terms.append(q1 - poly)
        vel_terms.append(state.qvel[d1] - dpoly * state.qvel[d2])
        solrefs.append(model.eq_solref[e])
        solimps.append(model.eq_solimp[e])
        lower_bounded.append(False)
    for l in range(t.nlimit):
        d = int(t.limit_dof[l])
        q = state.qpos[t.limit_qadr[l]]
        lo, hi = model.limit_range[l, 0], model.limit_range[l, 1]
        for sign, dist in ((1.0, q - lo), (-1.0, hi - q)):
            row = jnp.zeros(t.nv, dtype).at[d].set(sign)
            J_rows.append(row)
            pos_terms.append(jnp.minimum(dist, 0.0))
            vel_terms.append(sign * state.qvel[d])
            solrefs.append(model.limit_solref[l])
            solimps.append(model.limit_solimp[l])
            lower_bounded.append(True)
    if not J_rows:
        return None
    J = jnp.stack(J_rows)
    posv = jnp.stack(pos_terms)
    velv = jnp.stack(vel_terms)
    solref = jnp.stack(solrefs)
    solimp = jnp.stack(solimps)
    lb = np.array(lower_bounded)
    imp = impedance(solimp, posv)
    ks, bs = kb_from_solref(solref, solimp[..., 1])
    aref = -bs * velv - ks * imp * posv
    act = jnp.where(jnp.asarray(lb), posv < 0.0, True)
    return J, aref, imp, act, lb


def constraint_forces(model: Model, state: State, kin: Kin, minv: jax.Array,
                      qacc_smooth: jax.Array, ncon: int, iterations: int,
                      warm=None):
    """Solve for constraint impulses; returns (qfrc_constraint (nv,),
    ContactSet (for diagnostics / grasp detection), warm′).

    ``warm`` is the previous step's solution in CANDIDATE space — a pair
    (f_cand (ncand, 3), f_scalar (S,)) as produced by this function (build
    a zero initial one with `init_warm`). Candidate slots are stable per
    (pair, point) across steps, so gathering the previous forces through
    the current top-k selection warm-starts the APGD exactly like
    MuJoCo's warmstart of efc_force. This matters enormously for stiff
    persistent contact: a two-finger pinch stalls the gripper motor at
    several thousand newtons of normal force, reached by ACCUMULATING the
    solution across steps — a cold start from zero re-converges the whole
    force from scratch every 2 ms and never gets there before the fingers
    crush through the object (verified against MuJoCo on the grasp-parity
    box pinch: mj holds at ~6 kN, the cold-started solve plateaued ~40x
    low and the object was ejected).

    ``minv`` is the explicit per-tree M^-1 block stack (ntree, mt, mt) from
    dynamics.inv_blocks: every M^-1 application below — Delassus blocks,
    scalar-row diagonals, and one per solver iteration — is an einsum
    against it, and every per-contact tree read/write goes through one-hot
    matmuls (T1/T2), keeping the whole solver on the MXU instead of
    TPU gather/scatter loops (profiled ~4x on the APGD iteration)."""
    t = model.topo
    dtype = state.qvel.dtype
    con = make_contacts(model, kin, ncon)
    K = con.dist.shape[0]
    mt = t.mtdof
    h_ref = t.impratio

    minv_pad = jnp.concatenate(
        [minv, jnp.zeros((1, mt, mt), dtype)])             # (ntree+1, mt, mt)
    T1 = jax.nn.one_hot(con.tree1, t.ntree + 1, dtype=dtype)   # (K, ntree+1)
    T2 = jax.nn.one_hot(con.tree2, t.ntree + 1, dtype=dtype)

    def rows_dot(X):
        """Per-contact J . X[tree] for a per-tree field X (ntree+1, mt)."""
        return (jnp.einsum("krm,km->kr", con.J1, T1 @ X)
                + jnp.einsum("krm,km->kr", con.J2, T2 @ X))

    # ---- contact row parameters
    r = con.dist - con.margin                       # violation (<0 active)
    imp = impedance(con.solimp, r)
    ks, bs = kb_from_solref(con.solref, con.solimp[..., 1])
    qvel_tree = jnp.zeros((t.ntree + 1, mt), dtype).at[t.dof_tree, t.dof_treeidx].set(state.qvel)
    jv = rows_dot(qvel_tree)                                      # (K, 6)
    pos_term = jnp.concatenate(
        [r[:, None], jnp.zeros((K, 5), dtype)], axis=1
    )
    aref = -bs[:, None] * jv - (ks * imp)[:, None] * pos_term

    # ---- exact per-contact Delassus blocks G = sum_side J M^-1 J^T
    Mi1 = jnp.einsum("kt,tmn->kmn", T1, minv_pad)     # (K, mt, mt)
    Mi2 = jnp.einsum("kt,tmn->kmn", T2, minv_pad)
    G = (jnp.einsum("krm,kmn,ksn->krs", con.J1, Mi1, con.J1)
         + jnp.einsum("krm,kmn,ksn->krs", con.J2, Mi2, con.J2))  # (K, 6, 6)
    diagA = jnp.diagonal(G, axis1=-2, axis2=-1)
    # a contact whose normal row has (numerically) zero Delassus diagonal
    # cannot be resisted by any dof (e.g. a vertical force on a body whose only
    # dof is a vertical-axis rotation) — excluding it is both physically right
    # and required for boundedness of the dual problem
    resistible = diagA[:, 0] > 1e-9
    active = con.active & resistible
    # KNOWN DEVIATION (motor-stall pinches): MuJoCo's default pyramidal
    # cone splits a sticking contact's normal force over 2(condim-1)
    # facet rows, each with its own regularizer — the effective normal
    # compliance in stiction is up to ~20x stiffer than the nominal
    # soft-constraint spring, so a motor-driven two-finger pinch stalls
    # there at ~kN forces within a few mm (measured mj: 11.7 kN at 5 mm
    # penetration on the grasp-parity box). Our elliptic-cone dual with
    # the nominal R reaches its (converged, verified vs dense solve)
    # optimum near ~0.5 kN at the same state, so hard pinches sink deeper
    # and can squeeze rigid objects out where MuJoCo holds them. Matching
    # this regime needs an implicitly-coupled (Newton-style) solve of the
    # facet model, not a larger iteration budget — tracked for a future
    # round; grasp tests gate the behaviors that DO match (see
    # tests/test_grasp_parity.py).
    R_norm = (1.0 - imp) / imp * jnp.maximum(diagA[:, 0], 1e-10)
    R_fric = ((1.0 - imp) / imp)[:, None] * jnp.maximum(diagA[:, 1:], 1e-10) / h_ref
    Rrow = jnp.concatenate([R_norm[:, None], R_fric], axis=1)     # (K, 6)
    Rrow = jnp.where(con.dim_mask, Rrow, 1.0)

    # ---- b vector: J qacc_smooth - aref
    qacc_tree = jnp.zeros((t.ntree + 1, mt), dtype).at[t.dof_tree, t.dof_treeidx].set(qacc_smooth)
    b_con = rows_dot(qacc_tree) - aref

    Gm = jnp.where(con.dim_mask[:, :, None] & con.dim_mask[:, None, :], G, 0.0)
    rowmask = con.dim_mask & active[:, None]
    mu_t = jnp.maximum(con.friction[:, 0], 1e-6)

    def project3(f3):
        """Exact Euclidean projection onto the circular Coulomb cone
        {(fn, ft): ||ft|| <= mu fn} (both tangent axes share mu, so the cone
        is circular and the closed form is exact)."""
        fn = f3[:, 0]
        ft = jnp.where(rowmask[:, 1:3], f3[:, 1:], 0.0)
        nt = jnp.linalg.norm(ft, axis=1)
        inside = nt <= mu_t * fn
        polar = mu_t * nt <= -fn
        c = (fn + mu_t * nt) / (1.0 + mu_t * mu_t)
        fn_new = jnp.where(inside, jnp.maximum(fn, 0.0), jnp.where(polar, 0.0, c))
        scale = jnp.where(
            inside, 1.0, jnp.where(polar, 0.0, c * mu_t / jnp.maximum(nt, 1e-12))
        )
        out = jnp.concatenate([fn_new[:, None], ft * scale[:, None]], axis=1)
        return jnp.where(rowmask[:, :3], out, 0.0)

    # ---- scalar (equality + limit) rows, solved jointly with the contacts
    srows = _scalar_rows(model, state)
    if srows is not None:
        from mujoco_rl_ur5_tpu.physics.dynamics import minv_apply

        Js, aref_s, imp_s, act_s, lb_s = srows
        S = Js.shape[0]
        AinvJsT = jax.vmap(lambda row: minv_apply(model, minv, row))(Js)
        diagAs = jnp.einsum("sv,sv->s", Js, AinvJsT)
        R_s = (1.0 - imp_s) / imp_s * jnp.maximum(diagAs, 1e-10)
        b_s = Js @ qacc_smooth - aref_s

    # ---- matvec A f over all constraint families (pure einsums: the
    # scatter-adds here were the VMEM-write-bound hot spot of the solver
    # loop; T^T-matmuls do the same reduction on the MXU)
    def scatter_forces(f_con):
        contrib1 = jnp.einsum("krm,kr->km", con.J1, f_con)
        contrib2 = jnp.einsum("krm,kr->km", con.J2, f_con)
        return (jnp.einsum("kt,km->tm", T1, contrib1)
                + jnp.einsum("kt,km->tm", T2, contrib2))

    def scatter_scalar(f_s):
        qfrc_s = Js.T @ f_s                                     # (nv,)
        return (jnp.zeros((t.ntree + 1, mt), dtype)
                .at[t.dof_tree, t.dof_treeidx].set(qfrc_s))

    def minv_tree(F):
        x = jnp.einsum("tij,tj->ti", minv, F[: t.ntree])
        return jnp.concatenate([x, jnp.zeros((1, mt), dtype)])

    def matvec_all(f_con, f_s):
        """Coupled A-matvec over contacts + scalar rows: one M^-1 apply."""
        F = scatter_forces(f_con)
        if srows is not None:
            F = F + scatter_scalar(f_s)
        X = minv_tree(F)
        a_con = rows_dot(X)
        if srows is None:
            return a_con, None
        xdof = X[: t.ntree][t.dof_tree, t.dof_treeidx]          # (nv,)
        return a_con, Js @ xdof

    # ---- accelerated projected gradient with a GLOBAL scalar step
    # 1/lambda_max(A+R), estimated by power iteration on the coupled
    # operator (contacts + scalar rows as one system). A scalar step
    # commutes with the blockwise cone projection, so the FISTA
    # contraction argument holds.
    #
    # History (load-bearing): an earlier "mass-splitting" step — Gershgorin
    # bound per contact divided by the number of active contacts sharing
    # its trees — is provably contractive but catastrophically small for
    # contact CLUSTERS: in a two-finger pinch with ~16 active points on
    # one tree it yields steps ~1/700, and the FISTA iterates creep ~0.1 N
    # per iteration toward a multi-kN stall force. The solver then "looks
    # converged" (f32 stagnation at a few hundred N) while MuJoCo's Newton
    # reaches ~6 kN on the identical state, the fingers crush through the
    # grasped object, and the pinch ejects it. The power-iteration step is
    # typically 20-40x larger and the same scenario converges within ~100
    # iterations (gated behaviorally by tests/test_grasp_parity.py).
    bm = jnp.where(rowmask, b_con, 0.0)

    def raw_matvec(f, f_s):
        f = jnp.where(rowmask, f, 0.0)
        a_con, a_s = matvec_all(f, f_s)
        a_con = jnp.where(rowmask, a_con + Rrow * f, 0.0)
        if srows is not None:
            a_s = jnp.where(act_s, a_s + R_s * f_s, 0.0)
        return a_con, a_s

    def expand(f3):
        return jnp.concatenate([f3, jnp.zeros((K, 3), dtype)], axis=1)

    def pow_body(carry, _):
        v3, vs = carry
        a_con, a_s = raw_matvec(expand(v3), vs)
        a3 = a_con[:, :3]
        nrm = jnp.sqrt(jnp.sum(a3 * a3)
                       + (jnp.sum(a_s * a_s) if srows is not None else 0.0))
        nrm = jnp.maximum(nrm, 1e-12)
        return (a3 / nrm, (a_s / nrm if srows is not None else vs)), nrm

    v0 = jnp.where(rowmask[:, :3], 1.0, 0.0)
    v0 = v0 / jnp.maximum(jnp.sqrt(jnp.sum(v0 * v0)), 1e-12)
    vs0 = (jnp.where(act_s, 1.0, 0.0) if srows is not None
           else jnp.zeros((0,), dtype))
    (_, _), nrms = jax.lax.scan(pow_body, (v0, vs0), None, length=10)
    # 1.1x safety margin on the (under-)estimate; floor for the
    # no-active-rows corner case
    lam = jnp.maximum(1.1 * nrms[-1], 1e-6)
    s_c = jnp.full((K,), 1.0, dtype) / lam
    if srows is not None:
        s_s = 1.0 / lam

    def project_s(f_s):
        f_s = jnp.where(jnp.asarray(lb_s), jnp.maximum(f_s, 0.0), f_s)
        return jnp.where(act_s, f_s, 0.0)

    if warm is not None:
        Ssel = jax.nn.one_hot(con.sel, warm[0].shape[0], dtype=dtype)
        f0 = project3(Ssel @ warm[0])
        fs0 = project_s(warm[1]) if srows is not None else warm[1]
    else:
        f0 = jnp.zeros((K, 3), dtype)
        fs0 = (jnp.zeros((S,), dtype) if srows is not None
               else jnp.zeros((0,), dtype))

    def body(carry, _):
        f, fs, y, ys, tk = carry
        a_con, a_s = raw_matvec(expand(y), ys)
        g = (a_con + bm)[:, :3]
        f_new = project3(y - s_c[:, None] * g)
        if srows is not None:
            gs = a_s + jnp.where(act_s, b_s, 0.0)
            fs_new = project_s(ys - s_s * gs)
        else:
            fs_new = fs
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * tk * tk))
        mom = (tk - 1.0) / t_new
        y_new = f_new + mom * (f_new - f)
        ys_new = fs_new + mom * (fs_new - fs) if srows is not None else ys
        return (f_new, fs_new, y_new, ys_new, t_new), None

    (f3, f_s, _, _, _), _ = jax.lax.scan(
        body, (f0, fs0, f0, fs0, jnp.ones((), dtype)), None,
        length=iterations)
    f3 = project3(f3)
    if srows is not None:
        f_s = project_s(f_s)

    # ---- torsional/rolling rows (condim 4/6): one-shot decoupled solve given
    # the translational forces, clamped to their (tiny) cone bounds
    # (mu_torsion = friction[1], mu_rolling = friction[2]; e.g. 0.005/1e-4 in
    # the reference scenes). Deviation from MuJoCo's fully-coupled pyramidal
    # rows is negligible at these coefficients; tangential friction (the
    # dominant grasp physics) is handled exactly above.
    fA = expand(f3)
    Af, _ = raw_matvec(fA, f_s)
    mu_rot = jnp.stack(
        [con.friction[:, 1], con.friction[:, 2], con.friction[:, 2]], axis=1
    )
    bound = mu_rot * f3[:, :1]
    rot_diag = jnp.maximum(diagA[:, 3:], 1e-10) + Rrow[:, 3:]
    f_rot = jnp.clip(-(bm[:, 3:] + Af[:, 3:]) / rot_diag, -bound, bound)
    f_rot = jnp.where(rowmask[:, 3:], f_rot, 0.0)
    f_con = jnp.concatenate([f3, f_rot], axis=1)

    qfrc_tree = scatter_forces(f_con)[: t.ntree]
    qfrc = qfrc_tree[t.dof_tree, t.dof_treeidx]
    if srows is not None:
        qfrc = qfrc + Js.T @ f_s
    con = con.replace(forces=f_con)
    Ssel = jax.nn.one_hot(con.sel, n_candidates(model), dtype=dtype)
    warm_new = (jnp.einsum("kc,kr->cr", Ssel, f3), f_s)
    return qfrc, con, warm_new


def n_candidates(model: Model) -> int:
    """Static number of narrowphase candidate points (the warm-start
    vector's length; matches collide()'s concatenated output)."""
    t = model.topo
    total = 0
    for (t1, t2, idx) in t.pair_groups:
        cap = min(len(idx), BROADPHASE_CAP)
        if (t1, t2) in collision.NARROWPHASE:
            k = collision.NARROWPHASE[(t1, t2)][1]
        else:
            k = collision.HULL_NARROWPHASE[(t1, t2)][1]
        total += cap * k
    return total


def init_warm(model: Model, state: State, dtype=None):
    """Zero warm-start pytree for `constraint_forces` / `step_warm`:
    (candidate forces (ncand, 3), scalar-row forces (S,))."""
    dtype = dtype or state.qvel.dtype
    srows = _scalar_rows(model, state)
    S = 0 if srows is None else srows[0].shape[0]
    return (jnp.zeros((n_candidates(model), 3), dtype),
            jnp.zeros((S,), dtype))




