"""Pallas-fused arm dynamics: the grasp-MPC hot path as single TPU kernels.

Why this exists — measured on the chip (scripts/mpc_profile.py, B=256):
one `chain_step` (physics/chain.py) inside a rollout scan costs ~156 us of
wall time for ~10 us of math, because XLA lowers the unrolled FK/CRBA/RNE
graph to dozens of micro-kernels whose launch latency dominates at 8-dof
shapes. An iLQR solve serializes thousands of those steps, capping the
north-star metric at 22 solves/s vs the 32,000 target (BASELINE.md).

Design (see /opt/skills/guides/pallas_guide.md):
  * Batch-in-lanes layout: a tile of 1024 scenarios is one (8, 128) f32
    vreg; every per-scenario scalar (a joint angle, one entry of the mass
    matrix) is exactly one vector register, so each arithmetic op in the
    physics is ONE VPU instruction for 1024 scenarios.
  * The whole substep — FK, CRBA, RNE, equilibrated Cholesky solve,
    semi-implicit Euler — is generated as straight-line code over
    float-or-array "symbolic" entries. Model constants (body poses, unit
    joint axes, inertias, topology masks) fold at TRACE time: multiplies
    by 0/1 vanish, so the per-substep op count is far below the generic
    dense formulation.
  * Three kernels reuse the same generated substep:
      - rollout_open:   H sequential knots in ONE kernel launch;
      - rollout_closed: the full line search — every alpha's closed-loop
        rollout u = ub + a d + K (x - xb) — in ONE kernel launch, with
        (alpha, horizon-chunk) as grid axes and the per-alpha (q, v) state
        carried in VMEM scratch, so the (B, H, nu, nx) gain tensor streams
        through VMEM chunk by chunk instead of blowing the budget;
      - lin_fd: forward-difference linearization; the perturbation index
        is a grid axis (nx+nu+1 rollouts of one knot each), differenced
        host-side — fully parallel over B x H.
  * Kernel BODIES are kept small (one knot = a fori_loop over substeps of
    one generated substep, ~2k vector stmts): Mosaic compile time scales
    with the emitted statement count, so the H knots / FD perturbations /
    line-search alphas all live on the sequential grid, not in the body.
  * The same generated substep runs unchanged OUTSIDE pallas (any array
    shape broadcasts), which is how tests gate it against
    `chain_step` (tests/test_pallas_chain.py) without TPU hardware.

Numerics: f32 with the same Jacobi equilibration as
ops/blockchol.solve_spd_scaled (the arm mass matrix mixes 20 kg links with
1e-6 finger inertias; see that module's docstring).

Replaces the same reference boundary as physics/chain.py: the serial
`sim.step()` PID loop of MujocoController.py:318-384, re-engineered as a
batched planning substrate.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_rl_ur5_tpu.physics.chain import ChainPlan

TILE = (8, 128)
TILE_N = TILE[0] * TILE[1]


def _interpret() -> bool:
    """Pallas interpret mode off-TPU (tests run on the CPU backend)."""
    return jax.default_backend() != "tpu"

# -- symbolic scalar layer ----------------------------------------------------
# Entries are Python floats (trace-time constants) or arrays. Arithmetic
# folds constants so topology zeros/ones disappear from the emitted code.


def _isf(x):
    return isinstance(x, float)


def _c(x) -> float:
    """Snap tiny parser noise to an exact zero so it folds."""
    x = float(x)
    return 0.0 if abs(x) < 1e-13 else x


def smul(a, b):
    if _isf(a):
        if a == 0.0:
            return 0.0
        if a == 1.0:
            return b
    if _isf(b):
        if b == 0.0:
            return 0.0
        if b == 1.0:
            return a
    return a * b


def sadd(*terms):
    live = [t for t in terms if not (_isf(t) and t == 0.0)]
    if not live:
        return 0.0
    consts = [t for t in live if _isf(t)]
    arrs = [t for t in live if not _isf(t)]
    acc = None
    if consts:
        s = float(sum(consts))
        if s != 0.0 or not arrs:
            acc = s
    for a in arrs:
        acc = a if acc is None else acc + a
    return 0.0 if acc is None else acc


def ssub(a, b):
    return sadd(a, sneg(b))


def sneg(a):
    if _isf(a):
        return -a
    return -a


def sdot(a, b):
    return sadd(*[smul(x, y) for x, y in zip(a, b)])


def smv(M, v):
    return [sdot(row, v) for row in M]


def smm(A, B):
    n, m = len(A), len(B[0])
    return [[sadd(*[smul(A[i][k], B[k][j]) for k in range(len(B))])
             for j in range(m)] for i in range(n)]


def scross(a, b):
    return [ssub(smul(a[1], b[2]), smul(a[2], b[1])),
            ssub(smul(a[2], b[0]), smul(a[0], b[2])),
            ssub(smul(a[0], b[1]), smul(a[1], b[0]))]


def svadd(a, b):
    return [sadd(x, y) for x, y in zip(a, b)]


def svsub(a, b):
    return [ssub(x, y) for x, y in zip(a, b)]


def svscale(s, v):
    return [smul(s, x) for x in v]


def _cmat(M) -> list:
    return [[_c(M[i][j]) for j in range(len(M[0]))] for i in range(len(M))]


def _cvec(v) -> list:
    return [_c(x) for x in v]


# -- generated substep --------------------------------------------------------


def make_fk(plan: ChainPlan):
    """Standalone symbolic FK over entry lists (the same generated code
    make_substep uses internally): fk(q) -> (xpos, xrot, anchor, axis_w).
    Used by the fused in-kernel cost evaluation (make_reach_cost in
    mpc/grasp_mpc.py) — unused outputs are dead-code-eliminated when the
    kernel jaxpr is lowered."""
    nv, nmov = plan.nv, plan.nmov
    body_pos = [_cvec(p) for p in plan.body_pos]
    body_rot = [_cmat(r) for r in plan.body_rot]
    parent_slot = [int(s) for s in plan.parent_slot]
    parent_p = [_cvec(p[:3]) for p in plan.parent_pose]
    parent_r = [_cmat(p[3:].reshape(3, 3)) for p in plan.parent_pose]
    jnt_dof = [int(d) for d in plan.jnt_dof]
    jnt_pos = [_cvec(p) for p in plan.jnt_pos]
    jnt_axis = [_cvec(a) for a in plan.jnt_axis]
    jnt_ref = [_c(r) for r in plan.jnt_ref]

    def fk(q):
        xpos, xrot = [], []
        anchor = [None] * nv
        axis_w = [None] * nv
        for i in range(nmov):
            ps = parent_slot[i]
            if ps >= 0:
                pp, pr = xpos[ps], xrot[ps]
            else:
                pp, pr = parent_p[i], parent_r[i]
            p_pre = svadd(pp, smv(pr, body_pos[i]))
            r_pre = smm(pr, body_rot[i])
            d = jnt_dof[i]
            if d >= 0:
                th = ssub(q[d], jnt_ref[i])
                cth, sth = jnp.cos(th), jnp.sin(th)
                ax = jnt_axis[i]
                aa = [[_c(ax[a] * ax[b]) for b in range(3)]
                      for a in range(3)]
                K = [[0.0, -ax[2], ax[1]],
                     [ax[2], 0.0, -ax[0]],
                     [-ax[1], ax[0], 0.0]]
                rj = [[sadd(aa[a][b],
                            smul(cth,
                                 _c((1.0 if a == b else 0.0) - aa[a][b])),
                            smul(sth, _c(K[a][b])))
                       for b in range(3)] for a in range(3)]
                jp = jnt_pos[i]
                anchor[d] = svadd(p_pre, smv(r_pre, jp))
                p = svadd(p_pre, smv(r_pre, svsub(jp, smv(rj, jp))))
                r = smm(r_pre, rj)
                axis_w[d] = smv(r, ax)
            else:
                p, r = p_pre, r_pre
            xpos.append(p)
            xrot.append(r)
        return xpos, xrot, anchor, axis_w

    return fk


def make_substep(plan: ChainPlan):
    """Build substep(q, v, u) -> (q2, v2) on lists of same-shape arrays.

    Semantics identical to chain_step (semi-implicit Euler with implicit
    joint damping on the equilibrated unrolled Cholesky); every model
    constant is baked as a Python float.
    """
    nv, nu, nmov = plan.nv, plan.nu, plan.nmov
    h = float(plan.timestep)
    grav = _cvec(plan.gravity)
    damping = _cvec(plan.damping)
    armature = _cvec(plan.armature)
    gear = _cvec(plan.gear)
    lo = _cvec(plan.ctrlrange[:, 0])
    hi = _cvec(plan.ctrlrange[:, 1])
    org = _cvec(plan.org)
    anc = plan.anc_dof.astype(bool)            # (nmov, nv)
    subb = plan.sub_body.astype(bool)          # (nmov, nmov)
    dof_subb = plan.dof_sub_body.astype(bool)  # (nv, nmov)
    mmask = plan.m_mask.astype(bool)           # (nv, nv)
    act_dof = [int(d) for d in plan.act_dof]

    # per-slot constants
    body_pos = [_cvec(p) for p in plan.body_pos]
    body_rot = [_cmat(r) for r in plan.body_rot]
    parent_slot = [int(s) for s in plan.parent_slot]
    parent_p = [_cvec(p[:3]) for p in plan.parent_pose]
    parent_r = [_cmat(p[3:].reshape(3, 3)) for p in plan.parent_pose]
    jnt_dof = [int(d) for d in plan.jnt_dof]
    jnt_pos = [_cvec(p) for p in plan.jnt_pos]
    jnt_axis = [_cvec(a) for a in plan.jnt_axis]
    jnt_ref = [_c(r) for r in plan.jnt_ref]
    ipos = [_cvec(p) for p in plan.ipos]
    irot = [_cmat(r) for r in plan.irot]
    idiag = [_cvec(d) for d in plan.idiag]
    mass = [_c(m) for m in plan.mass]
    dof_slot = [int(s) for s in plan.dof_slot]
    dof_parent = [int(s) for s in plan.dof_parent_slot]
    # joint-coupling equalities (implicit springs; see chain.chain_step)
    eqs = [(int(plan.eq_d1[e]), int(plan.eq_d2[e]),
            [_c(p) for p in plan.eq_poly[e]],
            _c(plan.eq_q01[e]), _c(plan.eq_q02[e]),
            float(plan.eq_kc[e, 0]), float(plan.eq_kc[e, 1]))
           for e in range(len(plan.eq_d1))]
    # solver sparsity: tree coupling plus the equality pairs (their A
    # entries live outside the ancestor mask)
    smask = [[bool(mmask[i][j]) or bool(mmask[j][i]) for j in range(nv)]
             for i in range(nv)]
    for d1, d2, *_ in eqs:
        smask[d1][d2] = smask[d2][d1] = True

    def fk(q):
        """-> xpos, xrot (per slot), anchor, axis_w (per dof)."""
        xpos, xrot = [], []
        anchor = [None] * nv
        axis_w = [None] * nv
        for i in range(nmov):
            ps = parent_slot[i]
            if ps >= 0:
                pp, pr = xpos[ps], xrot[ps]
            else:
                pp, pr = parent_p[i], parent_r[i]
            p_pre = svadd(pp, smv(pr, body_pos[i]))
            r_pre = smm(pr, body_rot[i])
            d = jnt_dof[i]
            if d >= 0:
                th = ssub(q[d], jnt_ref[i])
                cth, sth = jnp.cos(th), jnp.sin(th)
                ax = jnt_axis[i]
                aa = [[_c(ax[a] * ax[b]) for b in range(3)] for a in range(3)]
                K = [[0.0, -ax[2], ax[1]],
                     [ax[2], 0.0, -ax[0]],
                     [-ax[1], ax[0], 0.0]]
                rj = [[sadd(aa[a][b],
                            smul(cth, _c((1.0 if a == b else 0.0) - aa[a][b])),
                            smul(sth, _c(K[a][b])))
                       for b in range(3)] for a in range(3)]
                jp = jnt_pos[i]
                anchor[d] = svadd(p_pre, smv(r_pre, jp))
                p = svadd(p_pre, smv(r_pre, svsub(jp, smv(rj, jp))))
                r = smm(r_pre, rj)
                axis_w[d] = smv(r, ax)
            else:
                p, r = p_pre, r_pre
            xpos.append(p)
            xrot.append(r)
        return xpos, xrot, anchor, axis_w

    def imul(inert, v6):
        """10-param spatial inertia times a 6-vector (matches ops/spatial)."""
        m, hx, hy, hz = inert[0], inert[1], inert[2], inert[3]
        ixx, iyy, izz, ixy, ixz, iyz = inert[4:]
        w, vl = v6[:3], v6[3:]
        iw = [sadd(smul(ixx, w[0]), smul(ixy, w[1]), smul(ixz, w[2])),
              sadd(smul(ixy, w[0]), smul(iyy, w[1]), smul(iyz, w[2])),
              sadd(smul(ixz, w[0]), smul(iyz, w[1]), smul(izz, w[2]))]
        hv = [hx, hy, hz]
        return (svadd(iw, scross(hv, vl))
                + svsub(svscale(m, vl), scross(hv, w)))

    def mass_bias(q, v):
        xpos, xrot, anchor, axis_w = fk(q)
        # cdof rows
        cdof = [axis_w[d] + scross(svsub(anchor[d], org), axis_w[d])
                for d in range(nv)]
        # 10-param inertia of each body about org
        cinert = []
        for i in range(nmov):
            ri = smm(xrot[i], irot[i])
            # icom = ri diag(idiag) ri^T
            rd = [[smul(ri[a][b], idiag[i][b]) for b in range(3)]
                  for a in range(3)]
            icom = [[sdot(rd[a], ri[b]) for b in range(3)] for a in range(3)]
            com = svadd(xpos[i], smv(xrot[i], ipos[i]))
            cv = svsub(com, org)
            c2 = sdot(cv, cv)
            m = mass[i]
            iorg = [[sadd(icom[a][b],
                          smul(m, ssub(c2 if a == b else 0.0,
                                       smul(cv[a], cv[b]))))
                     for b in range(3)] for a in range(3)]
            cinert.append([m] + svscale(m, cv)
                          + [iorg[0][0], iorg[1][1], iorg[2][2],
                             iorg[0][1], iorg[0][2], iorg[1][2]])
        # CRBA
        crb = [[sadd(*[cinert[b][k] for b in range(nmov) if subb[s][b]])
                for k in range(10)] for s in range(nmov)]
        fmom = [imul(crb[dof_slot[d]], cdof[d]) for d in range(nv)]
        A = [[0.0] * nv for _ in range(nv)]
        for i in range(nv):
            for j in range(nv):
                if j > i:
                    continue
                if mmask[i][j]:
                    A[i][j] = sdot(fmom[i], cdof[j])
                    A[j][i] = A[i][j]
            A[i][i] = sadd(A[i][i], armature[i], h * damping[i])
        # RNE at qacc = 0 (per-dof products computed once, summed per body)
        contrib = [svscale(v[d], cdof[d]) for d in range(nv)]
        vbody = [[sadd(*[contrib[d][k] for d in range(nv) if anc[s][d]])
                  for k in range(6)] for s in range(nmov)]
        a0 = [0.0, 0.0, 0.0] + [sneg(g) for g in grav]
        acontrib = []
        for d in range(nv):
            pv = ([0.0] * 6 if dof_parent[d] < 0
                  else vbody[dof_parent[d]])
            cd = cdof[d]
            cdd = (scross(pv[:3], cd[:3])
                   + svadd(scross(pv[:3], cd[3:]),
                           scross(pv[3:], cd[:3])))
            acontrib.append(svscale(v[d], cdd))
        abody = []
        for s in range(nmov):
            acc = list(a0)
            for d in range(nv):
                if anc[s][d]:
                    acc = svadd(acc, acontrib[d])
            abody.append(acc)
        fb = []
        for s in range(nmov):
            iv = imul(cinert[s], vbody[s])
            f6 = imul(cinert[s], abody[s])
            w, vl = vbody[s][:3], vbody[s][3:]
            f6 = svadd(f6, svadd(scross(w, iv[:3]), scross(vl, iv[3:]))
                       + scross(w, iv[3:]))
            fb.append(f6)
        bias = []
        for d in range(nv):
            fsub = [sadd(*[fb[b][k] for b in range(nmov) if dof_subb[d][b]])
                    for k in range(6)]
            bias.append(sdot(cdof[d], fsub))
        return A, bias

    def solve_scaled(A, b):
        """Jacobi-equilibrated unrolled Cholesky solve (entry level);
        same algorithm as ops/blockchol.solve_spd_scaled. Topology zeros
        in A fold out of the factorization automatically."""
        s = [jax.lax.rsqrt(jnp.maximum(A[i][i], 1e-30)) for i in range(nv)]
        As = [[smul(smul(A[i][j], s[i]), s[j]) if smask[i][j]
               else 0.0 for j in range(nv)] for i in range(nv)]
        bs = [smul(b[i], s[i]) for i in range(nv)]
        L = [[0.0] * nv for _ in range(nv)]
        Linv_d = [None] * nv
        for j in range(nv):
            d = ssub(As[j][j], sadd(*[smul(L[j][k], L[j][k])
                                      for k in range(j)]))
            if _isf(d):
                d = jnp.asarray(d)
            Ld = jnp.sqrt(jnp.maximum(d, 1e-12))
            L[j][j] = Ld
            Linv_d[j] = 1.0 / Ld
            for i in range(j + 1, nv):
                off = ssub(As[i][j], sadd(*[smul(L[i][k], L[j][k])
                                            for k in range(j)]))
                L[i][j] = smul(off, Linv_d[j])
        # forward substitution L y = bs
        y = [None] * nv
        for i in range(nv):
            y[i] = smul(ssub(bs[i], sadd(*[smul(L[i][k], y[k])
                                           for k in range(i)])), Linv_d[i])
        # backward substitution L^T x = y
        x = [None] * nv
        for i in reversed(range(nv)):
            x[i] = smul(ssub(y[i], sadd(*[smul(L[k][i], x[k])
                                          for k in range(i + 1, nv)])),
                        Linv_d[i])
        return [smul(x[i], s[i]) for i in range(nv)]

    def substep(q: Sequence, v: Sequence, u: Sequence):
        A, bias = mass_bias(q, v)
        tau = [0.0] * nv
        for j, d in enumerate(act_dof):
            cj = jnp.clip(u[j], lo[j], hi[j])
            tau[d] = smul(gear[j], cj)
        qfrc = [ssub(tau[i], sadd(bias[i], smul(damping[i], v[i])))
                for i in range(nv)]
        for d1, d2, pc, q01, q02, k, cd in eqs:
            x2 = ssub(q[d2], q02)
            poly = sadd(pc[0], smul(pc[1], x2),
                        smul(pc[2], smul(x2, x2)),
                        smul(pc[3], smul(x2, smul(x2, x2))),
                        smul(pc[4], smul(smul(x2, x2), smul(x2, x2))))
            dpoly = sadd(pc[1], smul(2.0 * pc[2], x2),
                         smul(3.0 * pc[3], smul(x2, x2)),
                         smul(4.0 * pc[4], smul(x2, smul(x2, x2))))
            r = ssub(ssub(q[d1], q01), poly)
            rdot = ssub(v[d1], smul(dpoly, v[d2]))
            fm = sneg(sadd(smul(k, r), smul(h * k + cd, rdot)))
            qfrc[d1] = sadd(qfrc[d1], fm)
            qfrc[d2] = sadd(qfrc[d2], sneg(smul(dpoly, fm)))
            w = h * (h * k + cd)
            A[d1][d1] = sadd(A[d1][d1], w)
            A[d2][d2] = sadd(A[d2][d2], smul(w, smul(dpoly, dpoly)))
            off = sneg(smul(w, dpoly))
            A[d1][d2] = sadd(A[d1][d2], off)
            A[d2][d1] = sadd(A[d2][d1], off)
        qacc = solve_scaled(A, qfrc)
        v2 = [sadd(v[i], smul(h, qacc[i])) for i in range(nv)]
        q2 = [sadd(q[i], smul(h, v2[i])) for i in range(nv)]
        return q2, v2

    return substep


def make_knot_step(plan: ChainPlan, substeps: int, unroll: bool = False):
    """One MPC knot = `substeps` generated substeps.

    The default rolls the substeps with `fori_loop` so the emitted kernel
    body stays ~one substep long (Mosaic compile time is proportional to
    the statement count; an unrolled 12-substep body already takes minutes).
    ``unroll=True`` keeps the straight-line form for callers that feed
    constant entries and want them folded."""
    substep = make_substep(plan)

    def knot(q, v, u):
        if unroll:
            for _ in range(substeps):
                q, v = substep(q, v, u)
            return q, v

        def body(_, qv):
            q2, v2 = substep(list(qv[0]), list(qv[1]), u)
            return (tuple(q2), tuple(v2))

        q, v = jax.lax.fori_loop(0, substeps, body, (tuple(q), tuple(v)))
        return list(q), list(v)

    return knot


# -- host-side tile packing ---------------------------------------------------


def _pad_b(B: int) -> int:
    return -(-B // TILE_N) * TILE_N


def to_tiles(a: jax.Array) -> jax.Array:
    """(B, d0, d1, ...) -> (T, d0, d1, ..., 8, 128), zero-padding B."""
    B = a.shape[0]
    Bp = _pad_b(B)
    if Bp != B:
        a = jnp.concatenate(
            [a, jnp.zeros((Bp - B,) + a.shape[1:], a.dtype)], 0)
    rest = a.shape[1:]
    nd = len(rest)
    a = a.reshape((Bp // TILE_N,) + TILE + rest)
    # (T, 8, 128, *rest) -> (T, *rest, 8, 128)
    perm = (0,) + tuple(3 + i for i in range(nd)) + (1, 2)
    return jnp.transpose(a, perm)


def from_tiles(a: jax.Array, B: int) -> jax.Array:
    """(T, d..., 8, 128) -> (B, d...)."""
    nd = a.ndim - 3
    perm = (0, nd + 1, nd + 2) + tuple(1 + i for i in range(nd))
    a = jnp.transpose(a, perm)
    a = a.reshape((a.shape[0] * TILE_N,) + a.shape[3:])
    return a[:B]


# -- kernels ------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(0, 1))
def rollout_open(plan: ChainPlan, substeps: int, x0: jax.Array,
                 us: jax.Array) -> jax.Array:
    """Open-loop rollout: x0 (B, nx), us (B, H, nu) -> xs (B, H+1, nx).
    One kernel launch per batch tile; all H knots inside."""
    nv, nu = plan.nv, plan.nu
    nx = 2 * nv
    B, H = us.shape[0], us.shape[1]
    knot = make_knot_step(plan, substeps)

    def kernel(x0_ref, us_ref, xs_ref):
        q = [x0_ref[0, i] for i in range(nv)]
        v = [x0_ref[0, nv + i] for i in range(nv)]
        for i in range(nv):
            xs_ref[0, 0, i] = q[i]
            xs_ref[0, 0, nv + i] = v[i]

        def body(k, carry):
            q, v = list(carry[0]), list(carry[1])
            u = [us_ref[0, k, j] for j in range(nu)]
            q, v = knot(q, v, u)
            for i in range(nv):
                xs_ref[0, k + 1, i] = q[i]
                xs_ref[0, k + 1, nv + i] = v[i]
            return (tuple(q), tuple(v))

        jax.lax.fori_loop(0, H, body, (tuple(q), tuple(v)))

    x0t = to_tiles(x0)
    ust = to_tiles(us)
    T = x0t.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, nx) + TILE, lambda t: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, nu) + TILE, lambda t: (t, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, H + 1, nx) + TILE,
                               lambda t: (t, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, H + 1, nx) + TILE, x0.dtype),
        interpret=_interpret(),
    )(x0t, ust)
    return from_tiles(out, B)


@functools.partial(jax.jit, static_argnums=(0, 1, 7, 8))
def rollout_closed(plan: ChainPlan, substeps: int, x0: jax.Array,
                   xbar: jax.Array, ubar: jax.Array, K: jax.Array,
                   d: jax.Array, alphas: tuple, cost=None,
                   sref: jax.Array = None, tref: jax.Array = None) -> tuple:
    """Line-search rollouts for ALL alphas in one kernel launch.

    x0 (B, nx), xbar (B, H+1, nx), ubar (B, H, nu), K (B, H, nu, nx),
    d (B, H, nu) -> xs (B, A, H+1, nx), us (B, A, H, nu) where
    A = len(alphas). u = clip(ubar + a*d + K (x - xbar)).

    Grid = (tile, alpha, horizon-chunk): the body is ONE knot per loop
    iteration (small Mosaic program), the gain tensor streams through VMEM
    one CH-knot chunk at a time, and the per-alpha (q, v) state carries
    across chunks in scratch (chunk axis is fastest, so each alpha's
    rollout completes before the next alpha reuses the scratch).

    ``cost`` fuses the line search's candidate-cost evaluation into the
    same launch (the separate B x A x H cost pass was ~25%% of each iLQR
    iteration at B=4096): a static pair (stage_cb, term_cb) of symbolic
    builders — stage_cb(q, v, u, sref_k, tref) and term_cb(q, v, tref)
    over entry lists — accumulated per knot into a lane-tile scratch.
    ``sref`` (B, H, R) streams per-knot references (tracking), ``tref``
    (B, RT) holds per-scenario constants (targets / terminal refs). With
    ``cost`` set the return is (xs, us, costs (B, A))."""
    nv, nu = plan.nv, plan.nu
    nx = 2 * nv
    B, H = ubar.shape[0], ubar.shape[1]
    A = len(alphas)
    knot = make_knot_step(plan, substeps)
    lo = [_c(x) for x in plan.ctrlrange[:, 0]]
    hi = [_c(x) for x in plan.ctrlrange[:, 1]]
    # chunk H so the K block stays ~4 MB
    HC = 1
    while H % HC == 0 and (H // HC) * nu * nx * TILE_N * 4 > 4 * 2 ** 20:
        HC *= 2
    if H % HC:
        HC = H  # degenerate fallback: one knot per grid step
    CH = H // HC
    alphas_arr = jnp.asarray(alphas, jnp.float32)

    R = 0 if sref is None else sref.shape[-1]
    RT = 0 if tref is None else tref.shape[-1]

    def kernel(al_ref, x0_ref, xb_ref, ub_ref, K_ref, d_ref, *rest):
        if cost is not None:
            refs_in = rest[: (sref is not None) + (tref is not None)]
            xs_ref, us_ref, cost_ref = rest[len(refs_in): len(refs_in) + 3]
            qv, acc = rest[len(refs_in) + 3:]
            sref_ref = refs_in[0] if sref is not None else None
            tref_ref = refs_in[-1] if tref is not None else None
            tr = ([tref_ref[0, i] for i in range(RT)]
                  if tref is not None else [])
        else:
            xs_ref, us_ref = rest[0], rest[1]
            qv = rest[2]
        a = pl.program_id(1)
        j = pl.program_id(2)
        alpha = al_ref[a]

        @pl.when(j == 0)
        def _():
            for i in range(nx):
                qv[i] = x0_ref[0, i]
            if cost is not None:
                acc[0] = jnp.zeros(TILE, x0_ref.dtype)
        for i in range(nx):
            xs_ref[0, 0, 0, i] = qv[i]

        def body(kk, _):
            q = [qv[i] for i in range(nv)]
            v = [qv[nv + i] for i in range(nv)]
            x = q + v
            u = []
            for jj in range(nu):
                uacc = sadd(
                    ub_ref[0, kk, jj],
                    alpha * d_ref[0, kk, jj],
                    *[smul(K_ref[0, kk, jj, i],
                           ssub(x[i], xb_ref[0, kk, i]))
                      for i in range(nx)])
                u.append(jnp.clip(uacc, lo[jj], hi[jj]))
                us_ref[0, 0, kk, jj] = u[jj]
            if cost is not None:
                sr = ([sref_ref[0, kk, i] for i in range(R)]
                      if sref is not None else [])
                acc[0] = acc[0] + cost[0](q, v, u, sr, tr)
            q, v = knot(q, v, u)
            for i in range(nv):
                qv[i] = q[i]
                qv[nv + i] = v[i]
                xs_ref[0, 0, kk + 1, i] = q[i]
                xs_ref[0, 0, kk + 1, nv + i] = v[i]
            return 0

        jax.lax.fori_loop(0, CH, body, 0)
        if cost is not None:
            @pl.when(j == HC - 1)
            def _():
                q = [qv[i] for i in range(nv)]
                v = [qv[nv + i] for i in range(nv)]
                cost_ref[0, 0] = acc[0] + cost[1](q, v, tr)

    x0t = to_tiles(x0)
    xbt = to_tiles(xbar[:, :H])          # terminal knot not needed
    ubt = to_tiles(ubar)
    Kt = to_tiles(K)
    dt_ = to_tiles(d)
    T = x0t.shape[0]
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, nx) + TILE, lambda t, a, j: (t, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CH, nx) + TILE,
                     lambda t, a, j: (t, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CH, nu) + TILE,
                     lambda t, a, j: (t, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CH, nu, nx) + TILE,
                     lambda t, a, j: (t, j, 0, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, CH, nu) + TILE,
                     lambda t, a, j: (t, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [alphas_arr, x0t, xbt, ubt, Kt, dt_]
    # xs blocks overlap by one knot (chunk j writes knots j*CH..j*CH+CH);
    # allocate HC*(CH+1) and un-chunk after.
    out_specs = [
        pl.BlockSpec((1, 1, CH + 1, nx) + TILE,
                     lambda t, a, j: (t, a, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, CH, nu) + TILE,
                     lambda t, a, j: (t, a, j, 0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((T, A, HC * (CH + 1), nx) + TILE, x0.dtype),
        jax.ShapeDtypeStruct((T, A, H, nu) + TILE, x0.dtype),
    ]
    scratch = [pltpu.VMEM((nx,) + TILE, x0.dtype)]
    if cost is not None:
        if sref is not None:
            in_specs.append(pl.BlockSpec(
                (1, CH, R) + TILE, lambda t, a, j: (t, j, 0, 0, 0),
                memory_space=pltpu.VMEM))
            args.append(to_tiles(sref))
        if tref is not None:
            in_specs.append(pl.BlockSpec(
                (1, RT) + TILE, lambda t, a, j: (t, 0, 0, 0),
                memory_space=pltpu.VMEM))
            args.append(to_tiles(tref))
        out_specs.append(pl.BlockSpec(
            (1, 1) + TILE, lambda t, a, j: (t, a, 0, 0),
            memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((T, A) + TILE, x0.dtype))
        scratch.append(pltpu.VMEM((1,) + TILE, x0.dtype))
    out = pl.pallas_call(
        kernel,
        grid=(T, A, HC),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*args)
    xs, us = out[0], out[1]
    # un-chunk the state axis: blocks of CH+1 knots overlap by one
    xs = from_tiles(xs, B)               # (B, A, HC*(CH+1), nx)
    xs = xs.reshape(B, A, HC, CH + 1, nx)
    first = xs[:, :, 0, :1]              # knot 0
    rest = xs[:, :, :, 1:].reshape(B, A, H, nx)
    xs = jnp.concatenate([first, rest], axis=2)
    us = from_tiles(us, B)
    if cost is not None:
        return xs, us, from_tiles(out[2], B)
    return xs, us


@functools.partial(jax.jit, static_argnums=(0, 1))
def lin_fd(plan: ChainPlan, substeps: int, xs: jax.Array,
           us: jax.Array) -> tuple:
    """Forward-difference linearization of the knot step.

    xs (B, H, nx) knot states, us (B, H, nu) -> F (B, H, nx, nx),
    L (B, H, nx, nu). All B*H instances are packed into lane tiles; the
    grid is (tile, perturbation): each grid cell rolls ONE knot with one
    input perturbed (or none, the base), and the differences form host-side.
    Step size 1e-3 (rad / rad/s / ctrl): relative FD error ~1e-4 in f32
    after equilibration, well under what the LM-regularized iLQR needs.
    """
    nv, nu = plan.nv, plan.nu
    nx = 2 * nv
    B, H = us.shape[0], us.shape[1]
    N = B * H
    knot = make_knot_step(plan, substeps)
    EPS = 1e-3
    P = nx + nu + 1              # perturbation grid axis; p == nx+nu is base

    def kernel(x_ref, u_ref, out_ref):
        p = pl.program_id(1)
        q = [x_ref[0, i] + jnp.where(p == i, EPS, 0.0) for i in range(nv)]
        v = [x_ref[0, nv + i] + jnp.where(p == nv + i, EPS, 0.0)
             for i in range(nv)]
        u = [u_ref[0, j] + jnp.where(p == nx + j, EPS, 0.0)
             for j in range(nu)]
        rq, rv = knot(q, v, u)
        res = rq + rv
        for i in range(nx):
            out_ref[0, 0, i] = res[i]

    xt = to_tiles(xs.reshape(N, nx))
    ut = to_tiles(us.reshape(N, nu))
    T = xt.shape[0]
    out = pl.pallas_call(
        kernel,
        grid=(T, P),
        in_specs=[
            pl.BlockSpec((1, nx) + TILE, lambda t, p: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nu) + TILE, lambda t, p: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, nx) + TILE,
                               lambda t, p: (t, p, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, P, nx) + TILE, xs.dtype),
        interpret=_interpret(),
    )(xt, ut)
    out = from_tiles(out, N)                      # (N, P, nx)
    base = out[:, nx + nu]                        # (N, nx)
    diff = (out[:, : nx + nu] - base[:, None]) * (1.0 / EPS)
    F = jnp.swapaxes(diff[:, :nx], 1, 2).reshape(B, H, nx, nx)
    L = jnp.swapaxes(diff[:, nx: nx + nu], 1, 2).reshape(B, H, nx, nu)
    return F, L
