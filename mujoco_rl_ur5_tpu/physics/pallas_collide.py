"""Pallas batch-in-lanes narrowphase: the contact step's dominant cost fused.

Why this exists — measured on the chip (scripts/step_profile.py, B=1024):
the full contact step costs 229 ms of which `collide` is 169 ms (74%), and
within that box-box SAT is 86 ms and the hull family 94 ms. The XLA
formulation vmaps per-scenario geometry whose tensors end in dims of 3 / 44
— at (8, 128)-tile granularity that is 2–12% lane utilization, hundreds of
tiny fused kernels, and a step rate that is flat from B=256 to B=4096
(BENCH_r03). Same disease the MPC path had; same medicine as
physics/pallas_chain.py.

Design (see /opt/skills/guides/pallas_guide.md):
  * Batch-in-lanes: the 128-lane axis of every vreg is 128 scenarios; the
    sublane axis holds the geometry's natural small dimension (8 box
    corners, 32 hull verts, 44 hull faces). Every scalar in the
    narrowphase math is a (1, 128) row; vert/face tables are (V, 128)
    tiles, so a "min over verts" is ONE cross-sublane reduce for 128
    scenarios.
  * Grid = (n_pairs, B/128): one candidate pair per grid step. Kernel
    bodies stay small (~1-2k vector stmts) so Mosaic compile time stays
    bounded; the pair axis lives on the grid, not in the body.
  * Per-pair/per-scenario operands arrive packed as one (n, C, B) channel
    block (geom poses, sizes, and — for capped mesh groups, where the
    broadphase top-k makes the pair->mesh map scenario-dependent — the
    gathered hull vertex/face tables). Packing is pure XLA transposes,
    pennies next to the narrowphase it feeds.
  * The math is an exact transcription of physics/collision.py (same
    guards, same tie-breaks: running argmax/argmin keep the FIRST
    extremum like lax.top_k/argmax, iterative masked picks reproduce
    top_k's stable ordering), so the solver-level parity gates
    (tests/test_grasp_parity.py, tests/test_contacts.py) hold unchanged.
    Gated per-kernel against the reference functions in
    tests/test_pallas_collide.py (interpret mode off-TPU).

Dispatch: physics/constraints.py `collide` routes each pair group through
`dispatch(...)`, a `jax.custom_batching.custom_vmap` wrapper — unbatched
(or off-TPU) calls run the reference jnp path; under the scenario vmap on
TPU the rule receives the whole batch and launches these kernels.

Replaces the same boundary as the reference's MuJoCo narrowphase (the C
collision pipeline inside every `sim.step()`,
gym_grasper/controller/MujocoController.py:379).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from mujoco_rl_ur5_tpu.physics import collision

BIG = collision.BIG
LANES = 128


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def use_pallas() -> bool:
    """Env-gated: MJTPU_PALLAS_COLLIDE = 1 (force on) / 0 (off) / auto."""
    v = os.environ.get("MJTPU_PALLAS_COLLIDE", "auto")
    if v == "1":
        return True
    if v == "0":
        return False
    return jax.default_backend() == "tpu"


# ---------------------------------------------------------------------------
# tile math: every "scalar" is a (r, 128) f32 array (r=1, or V for tables)
# ---------------------------------------------------------------------------


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (
        a[1] * b[2] - a[2] * b[1],
        a[2] * b[0] - a[0] * b[2],
        a[0] * b[1] - a[1] * b[0],
    )


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _where3(c, a, b):
    return (
        jnp.where(c, a[0], b[0]),
        jnp.where(c, a[1], b[1]),
        jnp.where(c, a[2], b[2]),
    )


def _norm3(a):
    return jnp.sqrt(_dot3(a, a))


def _sign(x):
    # jnp.sign semantics (0 -> 0), elementwise on tiles
    return jnp.sign(x)


def _quat_rows(q):
    """q = (w, x, y, z) rows -> R rows (world-from-local), ops/spatial.py:65."""
    w, x, y, z = q
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 2 * (x * x + y * y)
    r22 = 1 - r22
    return ((r00, r01, r02), (r10, r11, r12), (r20, r21, r22))


def _rot(R, v):
    """R @ v (local -> world)."""
    return (
        R[0][0] * v[0] + R[0][1] * v[1] + R[0][2] * v[2],
        R[1][0] * v[0] + R[1][1] * v[1] + R[1][2] * v[2],
        R[2][0] * v[0] + R[2][1] * v[1] + R[2][2] * v[2],
    )


def _rot_t(R, v):
    """R^T @ v (world -> local)."""
    return (
        R[0][0] * v[0] + R[1][0] * v[1] + R[2][0] * v[2],
        R[0][1] * v[0] + R[1][1] * v[1] + R[2][1] * v[2],
        R[0][2] * v[0] + R[1][2] * v[1] + R[2][2] * v[2],
    )


def _col(R, i):
    """Column i of R = world direction of local axis i."""
    return (R[0][i], R[1][i], R[2][i])


def _iota(rows):
    # Mosaic's iota is integer-only; cast to f32 for the where-arithmetic
    return jax.lax.broadcasted_iota(
        jnp.int32, (rows, LANES), 0).astype(jnp.float32)


def _pick_min(d, payloads, k, rows):
    """k smallest entries of d (rows, 128) along sublanes, stable order.

    Reproduces lax.top_k(-d, k): ascending d, ties broken toward the lower
    index. payloads: list of (rows, 128) tiles fetched at each pick.
    Returns (dists [k of (1,128)], fetched [k of list-of-(1,128)]).
    """
    iot = _iota(rows)
    dists, fetched = [], []
    for _ in range(k):
        m = jnp.min(d, axis=0, keepdims=True)
        idx = jnp.min(jnp.where(d == m, iot, float(rows)), axis=0,
                      keepdims=True)
        onehot = iot == idx
        dists.append(m)
        fetched.append([
            jnp.sum(jnp.where(onehot, p, 0.0), axis=0, keepdims=True)
            for p in payloads
        ])
        d = jnp.where(onehot, BIG, d)
    return dists, fetched


def _running_argmax(best, payload, cand_val, cand_payload):
    """First-max running update: (best, payload) <- cand if cand > best."""
    take = cand_val > best
    new_payload = [jnp.where(take, c, p) for c, p in zip(cand_payload, payload)]
    return jnp.where(take, cand_val, best), new_payload


# ---------------------------------------------------------------------------
# channel packing (outside the kernel; pure XLA reshapes/transposes)
# ---------------------------------------------------------------------------


def _pack(parts, B):
    """parts: list of (B, n, ...) -> packed (n, C, Bp) f32 + channel offsets.

    Trailing dims flatten in ORDER: a (B, n, 3, V) operand contributes 3V
    channels laid out x-block / y-block / z-block (callers pre-swap vert
    tables to (..., 3, V))."""
    cols, offs, off = [], [], 0
    for a in parts:
        a = jnp.asarray(a, jnp.float32)
        c = int(np.prod(a.shape[2:])) if a.ndim > 2 else 1
        cols.append(a.reshape(a.shape[0], a.shape[1], c))
        offs.append(off)
        off += c
    X = jnp.concatenate(cols, axis=-1)           # (B, n, C)
    X = jnp.moveaxis(X, 0, -1)                   # (n, C, B)
    Bp = -(-B // LANES) * LANES
    if Bp != B:
        X = jnp.pad(X, ((0, 0), (0, 0), (0, Bp - B)), mode="edge")
    return X, offs, off, Bp


def _run(body, X, n, C, K, Bp):
    OC = 7 * K
    out = pl.pallas_call(
        body,
        grid=(n, Bp // LANES),
        in_specs=[pl.BlockSpec((1, C, LANES), lambda i, j: (i, 0, j))],
        out_specs=pl.BlockSpec((1, OC, LANES), lambda i, j: (i, 0, j)),
        out_shape=jax.ShapeDtypeStruct((n, OC, Bp), jnp.float32),
        interpret=_interpret(),
    )(X)
    # (n, 7, K, Bp) -> (Bp, n, K, 7)
    Y = out.reshape(n, 7, K, Bp).transpose(3, 0, 2, 1)
    return Y


def _emit(o_ref, pos_rows, n_rows, d_rows, K):
    """pos/n_rows: K tuples of 3 rows; d_rows: K rows. Channel layout:
    7 quantity-blocks of K rows each: px,py,pz,nx,ny,nz,d."""
    rows = (
        [p[0] for p in pos_rows] + [p[1] for p in pos_rows]
        + [p[2] for p in pos_rows]
        + [v[0] for v in n_rows] + [v[1] for v in n_rows]
        + [v[2] for v in n_rows]
        + list(d_rows)
    )
    o_ref[0] = jnp.concatenate(rows, axis=0)


def _unpack(Y, B):
    pos = Y[:B, :, :, 0:3]
    nrm = Y[:B, :, :, 3:6]
    dist = Y[:B, :, :, 6]
    return pos, nrm, dist


# ---------------------------------------------------------------------------
# box-box kernel (collision.box_box + _box_box_edge, K = 9)
# ---------------------------------------------------------------------------

_SIGNS8 = [(sx, sy, sz) for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)]


def _load_pose(x, off):
    """(p (3 rows), q (4 rows), s (3 rows)) from channel offset."""
    p = (x[off + 0:off + 1], x[off + 1:off + 2], x[off + 2:off + 3])
    q = (x[off + 3:off + 4], x[off + 4:off + 5], x[off + 5:off + 6],
         x[off + 6:off + 7])
    s = (x[off + 7:off + 8], x[off + 8:off + 9], x[off + 9:off + 10])
    return p, q, s


def _corners8(p, R, s):
    """(8, 128) world corner components; sign table unrolled as scalars
    (Pallas kernels cannot capture array constants)."""
    rows = [[], [], []]
    for sx, sy, sz in _SIGNS8:
        cx, cy, cz = sx * s[0], sy * s[1], sz * s[2]
        rows[0].append(p[0] + R[0][0] * cx + R[0][1] * cy + R[0][2] * cz)
        rows[1].append(p[1] + R[1][0] * cx + R[1][1] * cy + R[1][2] * cz)
        rows[2].append(p[2] + R[2][0] * cx + R[2][1] * cy + R[2][2] * cz)
    return tuple(jnp.concatenate(r, axis=0) for r in rows)


def _corner_in_box(c, pb, Rb, sb):
    """collision.box_box corner_in_box, corners (8,128) vs one box."""
    d = _sub3(c, pb)
    cl = _rot_t(Rb, d)                                    # (8,128) x3
    fd = [sb[a] - jnp.abs(cl[a]) for a in range(3)]       # face_d per axis
    inside = (fd[0] > 0) & (fd[1] > 0) & (fd[2] > 0)
    # argmin over the 3 axes (first-min tie like jnp.argmin)
    k01 = jnp.where(fd[1] < fd[0], 1.0, 0.0)
    fmin01 = jnp.minimum(fd[0], fd[1])
    kmin = jnp.where(fd[2] < fmin01, 2.0, k01)
    fmin = jnp.minimum(fmin01, fd[2])
    clk = jnp.where(kmin == 0.0, cl[0], jnp.where(kmin == 1.0, cl[1], cl[2]))
    sgn = _sign(clk) + jnp.where(clk == 0.0, 1.0, 0.0)
    nl = tuple(jnp.where(kmin == float(a), sgn, 0.0) for a in range(3))
    dist = jnp.where(inside, -fmin, BIG)
    nw = _rot(Rb, nl)
    insf = jnp.where(inside, 1.0, 0.0)
    pos = _sub3(c, _scale3(nw, 0.5 * dist * insf))
    return pos, nw, dist


def _segment_closest_rows(pa, ua, ha, pb, ub, hb):
    """collision._segment_closest on (1,128) rows."""
    r = _sub3(pa, pb)
    a = _dot3(ua, ua)
    e = _dot3(ub, ub)
    f = _dot3(ub, r)
    c = _dot3(ua, r)
    b = _dot3(ua, ub)
    denom = a * e - b * b
    ok = jnp.abs(denom) > 1e-12
    s = jnp.where(ok, (b * f - c * e) / jnp.where(ok, denom, 1.0), 0.0)
    s = jnp.clip(s, -ha, ha)
    t = jnp.clip((b * s + f) / jnp.maximum(e, 1e-12), -hb, hb)
    s = jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), -ha, ha)
    return s, t


def _make_box_box_body(offs):
    o1, o2 = offs

    def body(x_ref, o_ref):
        x = x_ref[0]
        p1, q1, s1 = _load_pose(x, o1)
        p2, q2, s2 = _load_pose(x, o2)
        R1, R2 = _quat_rows(q1), _quat_rows(q2)
        c1 = _corners8(p1, R1, s1)
        c2 = _corners8(p2, R2, s2)
        posa, na, da = _corner_in_box(c1, p2, R2, s2)
        posb, nb, db = _corner_in_box(c2, p1, R1, s1)
        da_k, feta = _pick_min(da, [posa[0], posa[1], posa[2],
                                    na[0], na[1], na[2]], 4, 8)
        db_k, fetb = _pick_min(db, [posb[0], posb[1], posb[2],
                                    nb[0], nb[1], nb[2]], 4, 8)
        pos_e, n_e, d_e = _box_box_edge_rows(p1, R1, s1, p2, R2, s2)
        pos_rows = ([(f[0], f[1], f[2]) for f in feta]
                    + [(f[0], f[1], f[2]) for f in fetb] + [pos_e])
        # corner of 1 in 2 -> normal(1->2) = -n; corner of 2 in 1 -> +n
        n_rows = ([(-f[3], -f[4], -f[5]) for f in feta]
                  + [(f[3], f[4], f[5]) for f in fetb] + [n_e])
        d_rows = da_k + db_k + [d_e]
        _emit(o_ref, pos_rows, n_rows, d_rows, 9)

    return body


def _box_box_edge_rows(p1, R1, s1, p2, R2, s2):
    """collision._box_box_edge on rows; A/B rows are box axes in world."""
    d12 = _sub3(p2, p1)
    A = [_col(R1, i) for i in range(3)]
    B = [_col(R2, j) for j in range(3)]
    s1v = [s1[0], s1[1], s1[2]]
    s2v = [s2[0], s2[1], s2[2]]

    def overlap(L):
        proj1 = sum(jnp.abs(_dot3(A[m], L)) * s1v[m] for m in range(3))
        proj2 = sum(jnp.abs(_dot3(B[m], L)) * s2v[m] for m in range(3))
        return jnp.abs(_dot3(d12, L)) - (proj1 + proj2)

    # 15 axes: 6 faces then 9 crosses (k = 3i + j)
    sep_any = None
    best_pen = None       # running argmin over pen with first-min ties
    best_idx = None
    crosses = []
    for a, L in enumerate(A + B):
        sep = overlap(L)
        sep_any = sep if sep_any is None else jnp.maximum(sep_any, sep)
        pen = -sep
        if best_pen is None:
            best_pen, best_idx = pen, jnp.zeros_like(pen)
        else:
            take = pen < best_pen
            best_pen = jnp.where(take, pen, best_pen)
            best_idx = jnp.where(take, float(a), best_idx)
    for i in range(3):
        for j in range(3):
            cr = _cross3(A[i], B[j])
            cn = _norm3(cr)
            valid = cn > 1e-8
            cu = _scale3(cr, 1.0 / jnp.maximum(cn, 1e-12))
            sep = overlap(cu)
            sep = jnp.where(valid, sep, -BIG)
            sep_any = jnp.maximum(sep_any, sep)
            pen = jnp.where(valid, -sep, BIG)
            a = 6 + 3 * i + j
            take = pen < best_pen
            best_pen = jnp.where(take, pen, best_pen)
            best_idx = jnp.where(take, float(a), best_idx)
            crosses.append(cu)
    separated = sep_any > 0
    edge_wins = best_idx >= 6.0
    # per-lane combo select: L, A[i], B[j], s1[i], s2[j], onehots of i and j
    zr = jnp.zeros_like(best_pen)
    L = (zr, zr, zr)
    Ai = (zr, zr, zr)
    Bj = (zr, zr, zr)
    s1i = zr
    s2j = zr
    ihot = [zr, zr, zr]
    jhot = [zr, zr, zr]
    for i in range(3):
        for j in range(3):
            selv = best_idx == float(6 + 3 * i + j)
            cu = crosses[3 * i + j]
            L = _where3(selv, cu, L)
            Ai = _where3(selv, A[i], Ai)
            Bj = _where3(selv, B[j], Bj)
            s1i = jnp.where(selv, s1v[i], s1i)
            s2j = jnp.where(selv, s2v[j], s2j)
            ihot[i] = jnp.where(selv, 1.0, ihot[i])
            jhot[j] = jnp.where(selv, 1.0, jhot[j])
    L = _scale3(L, _sign(_dot3(L, d12)))
    # supporting edge midpoints
    e1 = p1
    e2 = p2
    for m in range(3):
        sg1 = _sign(_dot3(A[m], L))
        w1 = (1.0 - ihot[m]) * sg1 * s1v[m]
        e1 = _add3(e1, _scale3(A[m], w1))
        sg2 = _sign(_dot3(B[m], L))
        w2 = (1.0 - jhot[m]) * sg2 * s2v[m]
        e2 = _sub3(e2, _scale3(B[m], w2))
    s_, t_ = _segment_closest_rows(e1, Ai, s1i, e2, Bj, s2j)
    a_pt = _add3(e1, _scale3(Ai, s_))
    b_pt = _add3(e2, _scale3(Bj, t_))
    dist = jnp.where(separated | ~edge_wins, BIG, -best_pen)
    mid = _scale3(_add3(a_pt, b_pt), 0.5)
    return mid, L, dist


# ---------------------------------------------------------------------------
# hull kernels (collision.hull_hull family)
# ---------------------------------------------------------------------------


def _load_vec(x, off, r):
    return (x[off:off + r], x[off + r:off + 2 * r], x[off + 2 * r:off + 3 * r])


def _hull_world_rows(p, R, v, n, d):
    """collision._hull_world on tiles: v/n are (V,128)x3 local tables."""
    vw = (p[0] + R[0][0] * v[0] + R[0][1] * v[1] + R[0][2] * v[2],
          p[1] + R[1][0] * v[0] + R[1][1] * v[1] + R[1][2] * v[2],
          p[2] + R[2][0] * v[0] + R[2][1] * v[1] + R[2][2] * v[2])
    nw = (R[0][0] * n[0] + R[0][1] * n[1] + R[0][2] * n[2],
          R[1][0] * n[0] + R[1][1] * n[1] + R[1][2] * n[2],
          R[2][0] * n[0] + R[2][1] * n[1] + R[2][2] * n[2])
    dw = d + nw[0] * p[0] + nw[1] * p[1] + nw[2] * p[2]
    return vw, nw, dw


def _best_face(vw, m, nw, dw, F):
    """argmax_f [ min over masked verts of (vw . n_f) - d_f ]; returns
    (best_sep (1,128), chosen normal rows, chosen d row). First-max ties."""
    best = None
    payload = None
    for f in range(F):
        nf = (nw[0][f:f + 1], nw[1][f:f + 1], nw[2][f:f + 1])
        df = dw[f:f + 1]
        score = vw[0] * nf[0] + vw[1] * nf[1] + vw[2] * nf[2]
        score = jnp.where(m > 0.5, score, BIG)
        sep = jnp.min(score, axis=0, keepdims=True) - df
        if best is None:
            best, payload = sep, [nf[0], nf[1], nf[2], df]
        else:
            best, payload = _running_argmax(
                best, payload, sep, [nf[0], nf[1], nf[2], df])
    return best, (payload[0], payload[1], payload[2]), payload[3]


def _deepest8(vw, m, nA, dA, V):
    """collision.hull_hull's verts-vs-chosen-face top-8 with positions."""
    dist = vw[0] * nA[0] + vw[1] * nA[1] + vw[2] * nA[2] - dA
    dist = jnp.where(m > 0.5, dist, BIG)
    d_k, fet = _pick_min(dist, [vw[0], vw[1], vw[2]], 8, V)
    pos = [(f[0] - 0.5 * d * nA[0],
            f[1] - 0.5 * d * nA[1],
            f[2] - 0.5 * d * nA[2]) for f, d in zip(fet, d_k)]
    return pos, d_k


def _hull_hull_rows(p1, R1, v1, m1, n1, d1, p2, R2, v2, m2, n2, d2,
                    V1, F1, V2, F2):
    vw1, nw1, dw1 = _hull_world_rows(p1, R1, v1, n1, d1)
    vw2, nw2, dw2 = _hull_world_rows(p2, R2, v2, n2, d2)
    sep2, nA, dA = _best_face(vw1, m1, nw2, dw2, F2)   # face lives on hull 2
    sep1, nB, dB = _best_face(vw2, m2, nw1, dw1, F1)   # face lives on hull 1
    use2 = sep2 >= sep1
    posA, dAk = _deepest8(vw1, m1, nA, dA, V1)
    posB, dBk = _deepest8(vw2, m2, nB, dB, V2)
    pos_rows = [_where3(use2, a, b) for a, b in zip(posA, posB)]
    nrm = _where3(use2, (-nA[0], -nA[1], -nA[2]), nB)
    n_rows = [nrm] * 8
    d_rows = [jnp.where(use2, a, b) for a, b in zip(dAk, dBk)]
    return pos_rows, n_rows, d_rows


def _box_as_hull(p, R, s):
    """8-vert / 6-face hull tables for a box (collision.box_hull); sign and
    axis tables unrolled as scalars (no captured array constants)."""
    v = (jnp.concatenate([sx * s[0] for sx, _, _ in _SIGNS8], axis=0),
         jnp.concatenate([sy * s[1] for _, sy, _ in _SIGNS8], axis=0),
         jnp.concatenate([sz * s[2] for _, _, sz in _SIGNS8], axis=0))
    m = jnp.ones_like(v[0])
    one, zero = jnp.ones_like(s[0]), jnp.zeros_like(s[0])
    # faces: +x,+y,+z,-x,-y,-z
    n = (jnp.concatenate([one, zero, zero, -one, zero, zero], axis=0),
         jnp.concatenate([zero, one, zero, zero, -one, zero], axis=0),
         jnp.concatenate([zero, zero, one, zero, zero, -one], axis=0))
    d = jnp.concatenate([s[0], s[1], s[2], s[0], s[1], s[2]], axis=0)
    return v, m, n, d


def _make_hull_hull_body(offs, V1, F1, V2, F2, box1=False):
    """box1=True: operand 1 is a box (pose+size channels, hull synthesized)."""
    if box1:
        o1, ov2, om2, on2, od2, o2 = offs
    else:
        o1, ov1, om1, on1, od1, ov2, om2, on2, od2, o2 = offs

    def body(x_ref, o_ref):
        x = x_ref[0]
        if box1:
            p1, q1, s1 = _load_pose(x, o1)
            R1 = _quat_rows(q1)
            v1, m1, n1, d1 = _box_as_hull(p1, R1, s1)
        else:
            p1 = (x[o1:o1 + 1], x[o1 + 1:o1 + 2], x[o1 + 2:o1 + 3])
            q1 = (x[o1 + 3:o1 + 4], x[o1 + 4:o1 + 5], x[o1 + 5:o1 + 6],
                  x[o1 + 6:o1 + 7])
            R1 = _quat_rows(q1)
            v1 = _load_vec(x, ov1, V1)
            m1 = x[om1:om1 + V1]
            n1 = _load_vec(x, on1, F1)
            d1 = x[od1:od1 + F1]
        p2 = (x[o2:o2 + 1], x[o2 + 1:o2 + 2], x[o2 + 2:o2 + 3])
        q2 = (x[o2 + 3:o2 + 4], x[o2 + 4:o2 + 5], x[o2 + 5:o2 + 6],
              x[o2 + 6:o2 + 7])
        R2 = _quat_rows(q2)
        v2 = _load_vec(x, ov2, V2)
        m2 = x[om2:om2 + V2]
        n2 = _load_vec(x, on2, F2)
        d2 = x[od2:od2 + F2]
        pos_rows, n_rows, d_rows = _hull_hull_rows(
            p1, R1, v1, m1, n1, d1, p2, R2, v2, m2, n2, d2, V1, F1, V2, F2)
        _emit(o_ref, pos_rows, n_rows, d_rows, 8)

    return body


def _make_plane_hull_body(offs, V):
    o1, ov2, om2 = offs

    def body(x_ref, o_ref):
        x = x_ref[0]
        p1 = (x[o1:o1 + 1], x[o1 + 1:o1 + 2], x[o1 + 2:o1 + 3])
        q1 = (x[o1 + 3:o1 + 4], x[o1 + 4:o1 + 5], x[o1 + 5:o1 + 6],
              x[o1 + 6:o1 + 7])
        o2 = om2 + V
        p2 = (x[o2:o2 + 1], x[o2 + 1:o2 + 2], x[o2 + 2:o2 + 3])
        q2 = (x[o2 + 3:o2 + 4], x[o2 + 4:o2 + 5], x[o2 + 5:o2 + 6],
              x[o2 + 6:o2 + 7])
        R1, R2 = _quat_rows(q1), _quat_rows(q2)
        n = _col(R1, 2)                              # plane z-axis in world
        v2 = _load_vec(x, ov2, V)
        m2 = x[om2:om2 + V]
        vw = (p2[0] + R2[0][0] * v2[0] + R2[0][1] * v2[1] + R2[0][2] * v2[2],
              p2[1] + R2[1][0] * v2[0] + R2[1][1] * v2[1] + R2[1][2] * v2[2],
              p2[2] + R2[2][0] * v2[0] + R2[2][1] * v2[1] + R2[2][2] * v2[2])
        dvert = vw[0] * n[0] + vw[1] * n[1] + vw[2] * n[2] - _dot3(n, p1)
        dvert = jnp.where(m2 > 0.5, dvert, BIG)
        d_k, fet = _pick_min(dvert, [vw[0], vw[1], vw[2]], 8, V)
        pos_rows = [(f[0] - 0.5 * d * n[0], f[1] - 0.5 * d * n[1],
                     f[2] - 0.5 * d * n[2]) for f, d in zip(fet, d_k)]
        _emit(o_ref, pos_rows, [n] * 8, d_k, 8)

    return body


def _sphere_hull_point_rows(c, r, nw, dw, F):
    """collision._sphere_hull_point: running argmax over faces."""
    best = None
    payload = None
    for f in range(F):
        nf = (nw[0][f:f + 1], nw[1][f:f + 1], nw[2][f:f + 1])
        score = _dot3(c, nf) - dw[f:f + 1]
        if best is None:
            best, payload = score, [nf[0], nf[1], nf[2]]
        else:
            best, payload = _running_argmax(best, payload, score,
                                            [nf[0], nf[1], nf[2]])
    nf = (payload[0], payload[1], payload[2])
    dist = best - r
    pos = _sub3(c, _scale3(nf, r + 0.5 * dist))
    return pos, (-nf[0], -nf[1], -nf[2]), dist


def _make_sphere_hull_body(offs, V, F):
    o1, ov2, om2, on2, od2, o2 = offs

    def body(x_ref, o_ref):
        x = x_ref[0]
        p1 = (x[o1:o1 + 1], x[o1 + 1:o1 + 2], x[o1 + 2:o1 + 3])
        r = x[o1 + 7:o1 + 8]                          # s1[0]
        p2 = (x[o2:o2 + 1], x[o2 + 1:o2 + 2], x[o2 + 2:o2 + 3])
        q2 = (x[o2 + 3:o2 + 4], x[o2 + 4:o2 + 5], x[o2 + 5:o2 + 6],
              x[o2 + 6:o2 + 7])
        R2 = _quat_rows(q2)
        v2 = _load_vec(x, ov2, V)
        n2 = _load_vec(x, on2, F)
        d2 = x[od2:od2 + F]
        _, nw, dw = _hull_world_rows(p2, R2, v2, n2, d2)
        pos, nrm, dist = _sphere_hull_point_rows(p1, r, nw, dw, F)
        _emit(o_ref, [pos], [nrm], [dist], 1)

    return body


def _make_capsule_hull_body(offs, V, F):
    o1, ov2, om2, on2, od2, o2 = offs

    def body(x_ref, o_ref):
        x = x_ref[0]
        p1 = (x[o1:o1 + 1], x[o1 + 1:o1 + 2], x[o1 + 2:o1 + 3])
        q1 = (x[o1 + 3:o1 + 4], x[o1 + 4:o1 + 5], x[o1 + 5:o1 + 6],
              x[o1 + 6:o1 + 7])
        r, hl = x[o1 + 7:o1 + 8], x[o1 + 8:o1 + 9]
        p2 = (x[o2:o2 + 1], x[o2 + 1:o2 + 2], x[o2 + 2:o2 + 3])
        q2 = (x[o2 + 3:o2 + 4], x[o2 + 4:o2 + 5], x[o2 + 5:o2 + 6],
              x[o2 + 6:o2 + 7])
        R1, R2 = _quat_rows(q1), _quat_rows(q2)
        v2 = _load_vec(x, ov2, V)
        m2 = x[om2:om2 + V]
        n2 = _load_vec(x, on2, F)
        d2 = x[od2:od2 + F]
        vw, nw, dw = _hull_world_rows(p2, R2, v2, n2, d2)
        msk = jnp.where(m2 > 0.5, 1.0, 0.0)
        cnt = jnp.maximum(jnp.sum(msk, axis=0, keepdims=True), 1.0)
        center = (jnp.sum(vw[0] * msk, axis=0, keepdims=True) / cnt,
                  jnp.sum(vw[1] * msk, axis=0, keepdims=True) / cnt,
                  jnp.sum(vw[2] * msk, axis=0, keepdims=True) / cnt)
        u = _col(R1, 2)
        tmid = jnp.clip(_dot3(_sub3(center, p1), u), -hl, hl)
        ts = [-hl, hl, tmid, 0.5 * (hl + tmid), 0.5 * (-hl + tmid)]
        pos_rows, n_rows, d_rows = [], [], []
        for t in ts:
            c = _add3(p1, _scale3(u, t))
            pos, nrm, dist = _sphere_hull_point_rows(c, r, nw, dw, F)
            pos_rows.append(pos)
            n_rows.append(nrm)
            d_rows.append(dist)
        _emit(o_ref, pos_rows, n_rows, d_rows, 5)

    return body


# ---------------------------------------------------------------------------
# batched entry points (inputs (B, n, ...) exactly as vmapped reference)
# ---------------------------------------------------------------------------


def box_box_batched(p1, q1, s1, p2, q2, s2):
    B, n = p1.shape[0], p1.shape[1]
    X, offs, C, Bp = _pack(
        [p1, q1, s1, p2, q2, s2], B)
    body = _make_box_box_body((offs[0], offs[3]))
    Y = _run(body, X, n, C, 9, Bp)
    return _unpack(Y, B)


def _swap_tables(v, n):
    """(B, n, V, 3) vert / (B, n, F, 3) face tables -> channel-major."""
    return v.swapaxes(-1, -2), n.swapaxes(-1, -2)


def hull_hull_batched(p1, q1, v1, m1, n1, d1, p2, q2, v2, m2, n2, d2):
    B, n = p1.shape[0], p1.shape[1]
    V1, F1 = v1.shape[2], n1.shape[2]
    V2, F2 = v2.shape[2], n2.shape[2]
    v1c, n1c = _swap_tables(v1, n1)
    v2c, n2c = _swap_tables(v2, n2)
    pq1 = jnp.concatenate([p1, q1], axis=-1)
    pq2 = jnp.concatenate([p2, q2], axis=-1)
    X, offs, C, Bp = _pack([pq1, v1c, m1, n1c, d1, v2c, m2, n2c, d2, pq2], B)
    body = _make_hull_hull_body(tuple(offs), V1, F1, V2, F2, box1=False)
    Y = _run(body, X, n, C, 8, Bp)
    return _unpack(Y, B)


def box_hull_batched(p1, q1, s1, p2, q2, v2, m2, n2, d2):
    B, n = p1.shape[0], p1.shape[1]
    V2, F2 = v2.shape[2], n2.shape[2]
    v2c, n2c = _swap_tables(v2, n2)
    pqs1 = jnp.concatenate([p1, q1, s1], axis=-1)
    pq2 = jnp.concatenate([p2, q2], axis=-1)
    X, offs, C, Bp = _pack([pqs1, v2c, m2, n2c, d2, pq2], B)
    body = _make_hull_hull_body(tuple(offs), 8, 6, V2, F2, box1=True)
    Y = _run(body, X, n, C, 8, Bp)
    return _unpack(Y, B)


def plane_hull_batched(p1, q1, s1, p2, q2, v2, m2, n2, d2):
    B, n = p1.shape[0], p1.shape[1]
    V = v2.shape[2]
    v2c, _ = _swap_tables(v2, n2)
    pq1 = jnp.concatenate([p1, q1], axis=-1)
    pq2 = jnp.concatenate([p2, q2], axis=-1)
    X, offs, C, Bp = _pack([pq1, v2c, m2, pq2], B)
    body = _make_plane_hull_body((offs[0], offs[1], offs[2]), V)
    Y = _run(body, X, n, C, 8, Bp)
    return _unpack(Y, B)


def sphere_hull_batched(p1, q1, s1, p2, q2, v2, m2, n2, d2):
    B, n = p1.shape[0], p1.shape[1]
    V, F = v2.shape[2], n2.shape[2]
    v2c, n2c = _swap_tables(v2, n2)
    pqs1 = jnp.concatenate([p1, q1, s1], axis=-1)
    pq2 = jnp.concatenate([p2, q2], axis=-1)
    X, offs, C, Bp = _pack([pqs1, v2c, m2, n2c, d2, pq2], B)
    body = _make_sphere_hull_body(tuple(offs), V, F)
    Y = _run(body, X, n, C, 1, Bp)
    return _unpack(Y, B)


def capsule_hull_batched(p1, q1, s1, p2, q2, v2, m2, n2, d2):
    B, n = p1.shape[0], p1.shape[1]
    V, F = v2.shape[2], n2.shape[2]
    v2c, n2c = _swap_tables(v2, n2)
    pqs1 = jnp.concatenate([p1, q1, s1], axis=-1)
    pq2 = jnp.concatenate([p2, q2], axis=-1)
    X, offs, C, Bp = _pack([pqs1, v2c, m2, n2c, d2, pq2], B)
    body = _make_capsule_hull_body(tuple(offs), V, F)
    Y = _run(body, X, n, C, 5, Bp)
    return _unpack(Y, B)


_HULL_BATCHED = {
    collision.GEOM_PLANE: plane_hull_batched,
    collision.GEOM_SPHERE: sphere_hull_batched,
    collision.GEOM_CAPSULE: capsule_hull_batched,
    collision.GEOM_BOX: box_hull_batched,
    collision.GEOM_MESH: hull_hull_batched,
}

_PRIM_BATCHED = {
    (collision.GEOM_BOX, collision.GEOM_BOX): box_box_batched,
}


# ---------------------------------------------------------------------------
# custom_vmap dispatch: per-scenario signature, kernel under the batch axis
# ---------------------------------------------------------------------------


def _bcast(axis_size, in_batched, ops):
    return [o if b else jnp.broadcast_to(o[None], (axis_size,) + o.shape)
            for o, b in zip(ops, in_batched)]


@functools.lru_cache(maxsize=None)
def _dispatch_prim(t1: int, t2: int):
    ref_fn, _ = collision.NARROWPHASE[(t1, t2)]
    kernel = _PRIM_BATCHED.get((t1, t2))

    def base(*ops):
        return jax.vmap(ref_fn)(*ops)

    f = jax.custom_batching.custom_vmap(base)

    @f.def_vmap
    def rule(axis_size, in_batched, *ops):
        ops_b = _bcast(axis_size, in_batched, ops)
        if kernel is None or not use_pallas():
            out = jax.vmap(base)(*ops_b)
        else:
            out = kernel(*ops_b)
        return out, (True, True, True)

    return f


@functools.lru_cache(maxsize=None)
def _dispatch_hull(t1: int):
    ref_fn, _ = collision.HULL_NARROWPHASE[(t1, collision.GEOM_MESH)]
    kernel = _HULL_BATCHED[t1]

    if t1 == collision.GEOM_MESH:
        def base(p1, q1, v1, m1, n1, d1, p2, q2, v2, m2, n2, d2):
            return jax.vmap(ref_fn)(p1, q1, v1, m1, n1, d1,
                                    p2, q2, v2, m2, n2, d2)
    else:
        def base(p1, q1, s1, p2, q2, v2, m2, n2, d2):
            return jax.vmap(ref_fn)(p1, q1, s1, p2, q2, v2, m2, n2, d2)

    f = jax.custom_batching.custom_vmap(base)

    @f.def_vmap
    def rule(axis_size, in_batched, *ops):
        ops_b = _bcast(axis_size, in_batched, ops)
        if use_pallas():
            out = kernel(*ops_b)
        else:
            out = jax.vmap(base)(*ops_b)
        return out, (True, True, True)

    return f


def dispatch(t1: int, t2: int, p1, q1, s1, p2, q2, s2):
    """Primitive-pair narrowphase over the pair axis; Pallas under vmap."""
    return _dispatch_prim(t1, t2)(p1, q1, s1, p2, q2, s2)


def dispatch_hull(t1: int, *ops):
    """X-vs-hull narrowphase over the pair axis; Pallas under vmap."""
    return _dispatch_hull(t1)(*ops)
