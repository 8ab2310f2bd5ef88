"""Vectorized analytic narrowphase for the scene's collision primitives.

TPU-native replacement for MuJoCo's collision pipeline (the reference's
contact stream comes from `sim.step()` inside MuJoCo's C engine). All
candidate geom pairs are enumerated at compile time (Model.topo.pair_geom1/2,
grouped by type pair); at runtime each group runs one vmapped narrowphase
function producing a *fixed* number of candidate contact points per pair.
Active contacts are then selected with a global top-k by penetration depth
(physics/constraints.py), which bounds solver memory for 4096-wide batches —
the static equivalent of MuJoCo's nconmax=1500 cap
(UR5gripper_2_finger_many_objects.xml:25).

Conventions: contact normal points from geom1 INTO geom2 (MuJoCo convention);
``dist`` is the signed surface separation (negative = penetrating). Points
with dist = BIG are inactive padding.

Supported type pairs (after mesh/cylinder->hull proxying at compile time):
plane-{sphere,capsule,box}, sphere-{sphere,capsule,box}, capsule-{capsule,box},
box-box, and every X-hull pair. Cylinders collide as 16-gon prism hulls
(scene/compile.py:_cylinder_prism_hull) — flat ends and rim edges like
MuJoCo's true cylinder, ~1% radius faceting error. Box-box generates
corner-vs-box samples both ways (8 points) plus one edge-edge SAT contact
for the crossed-edge case corner sampling misses.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.ops.spatial import quat_rotate, quat_rotate_inv, quat_to_mat

BIG = 1e10


def _pack(pos, normal, dist):
    return pos, normal, dist


# ---------------------------------------------------------------------------
# plane-X  (plane frame: z-axis is the outward normal)
# ---------------------------------------------------------------------------


def plane_sphere(p1, q1, s1, p2, q2, s2):
    n = quat_rotate(q1, jnp.array([0.0, 0, 1.0], p1.dtype))
    d = jnp.dot(n, p2 - p1)
    dist = d - s2[0]
    pos = p2 - n * (s2[0] + 0.5 * dist)
    return pos[None], n[None], dist[None]


def plane_capsule(p1, q1, s1, p2, q2, s2):
    n = quat_rotate(q1, jnp.array([0.0, 0, 1.0], p1.dtype))
    axis = quat_rotate(q2, jnp.array([0.0, 0, 1.0], p1.dtype))
    r, hl = s2[0], s2[1]
    ends = jnp.stack([p2 + axis * hl, p2 - axis * hl])
    d = ends @ n - jnp.dot(n, p1)
    dist = d - r
    pos = ends - n[None] * (r + 0.5 * dist)[:, None]
    return pos, jnp.broadcast_to(n, (2, 3)), dist


def plane_box(p1, q1, s1, p2, q2, s2):
    n = quat_rotate(q1, jnp.array([0.0, 0, 1.0], p1.dtype))
    R = quat_to_mat(q2)
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        p1.dtype,
    )
    corners = p2 + (signs * s2) @ R.T  # (8,3)
    d = corners @ n - jnp.dot(n, p1)
    # keep 4 lowest corners (a resting box has exactly 4)
    neg_d, idx = jax.lax.top_k(-d, 4)
    dist = -neg_d
    pos = corners[idx] - 0.5 * dist[:, None] * n[None]
    return pos, jnp.broadcast_to(n, (4, 3)), dist


# ---------------------------------------------------------------------------
# sphere-X
# ---------------------------------------------------------------------------


def sphere_sphere(p1, q1, s1, p2, q2, s2):
    d = p2 - p1
    L = jnp.linalg.norm(d)
    n = d / jnp.maximum(L, 1e-12)
    dist = L - (s1[0] + s2[0])
    pos = p1 + n * (s1[0] + 0.5 * dist)
    return pos[None], n[None], dist[None]


def _point_capsule_axis(p, pc, qc, hl):
    axis = quat_rotate(qc, jnp.array([0.0, 0, 1.0], p.dtype))
    t = jnp.clip(jnp.dot(p - pc, axis), -hl, hl)
    return pc + axis * t


def sphere_capsule(p1, q1, s1, p2, q2, s2):
    c = _point_capsule_axis(p1, p2, q2, s2[1])
    d = c - p1
    L = jnp.linalg.norm(d)
    n = d / jnp.maximum(L, 1e-12)
    dist = L - (s1[0] + s2[0])
    pos = p1 + n * (s1[0] + 0.5 * dist)
    return pos[None], n[None], dist[None]


def _sphere_box_core(center, r, pb, qb, sb):
    """Signed distance sphere center vs box; returns (pos, n, dist) world."""
    c_l = quat_rotate_inv(qb, center - pb)
    clamped = jnp.clip(c_l, -sb, sb)
    delta = c_l - clamped
    d_out = jnp.linalg.norm(delta)
    outside = d_out > 1e-9
    # outside: closest point on box surface
    n_out = delta / jnp.maximum(d_out, 1e-12)
    # inside: push out through nearest face
    face_d = sb - jnp.abs(c_l)  # distance to each face (positive inside)
    k = jnp.argmin(face_d)
    sgn = jnp.sign(c_l[k]) + (c_l[k] == 0.0)
    n_in = jnp.zeros(3, center.dtype).at[k].set(sgn)
    d_in = -face_d[k]
    n_l = jnp.where(outside, n_out, n_in)
    dist_c = jnp.where(outside, d_out, d_in)
    surf_l = jnp.where(outside, clamped, c_l - n_in * d_in)
    n_w = quat_rotate(qb, n_l)
    dist = dist_c - r
    pos = quat_rotate(qb, surf_l) + pb + 0.5 * dist * n_w
    return pos, n_w, dist


def sphere_box(p1, q1, s1, p2, q2, s2):
    pos, n_w, dist = _sphere_box_core(p1, s1[0], p2, q2, s2)
    # normal from sphere(1) into box(2): box->sphere normal negated
    return pos[None], (-n_w)[None], dist[None]


# ---------------------------------------------------------------------------
# capsule-X
# ---------------------------------------------------------------------------


def _segment_closest(pa, ua, ha, pb, ub, hb):
    """Closest parameters (s, t) between segments pa+s*ua, pb+t*ub."""
    r = pa - pb
    a = jnp.dot(ua, ua)
    e = jnp.dot(ub, ub)
    f = jnp.dot(ub, r)
    c = jnp.dot(ua, r)
    b = jnp.dot(ua, ub)
    denom = a * e - b * b
    s = jnp.where(jnp.abs(denom) > 1e-12, (b * f - c * e) / jnp.where(jnp.abs(denom) > 1e-12, denom, 1.0), 0.0)
    s = jnp.clip(s, -ha, ha)
    t = jnp.clip((b * s + f) / jnp.maximum(e, 1e-12), -hb, hb)
    s = jnp.clip((b * t - c) / jnp.maximum(a, 1e-12), -ha, ha)
    return s, t


def capsule_capsule(p1, q1, s1, p2, q2, s2):
    u1 = quat_rotate(q1, jnp.array([0.0, 0, 1.0], p1.dtype))
    u2 = quat_rotate(q2, jnp.array([0.0, 0, 1.0], p1.dtype))
    s, t = _segment_closest(p1, u1, s1[1], p2, u2, s2[1])
    a = p1 + u1 * s
    b = p2 + u2 * t
    d = b - a
    L = jnp.linalg.norm(d)
    n = d / jnp.maximum(L, 1e-12)
    dist = L - (s1[0] + s2[0])
    pos = a + n * (s1[0] + 0.5 * dist)
    return pos[None], n[None], dist[None]


def capsule_box(p1, q1, s1, p2, q2, s2):
    """5 candidate points along the capsule axis (endpoints, midpoints, and
    the segment point nearest the box center), each tested as a sphere
    against the box. Denser sampling keeps the deepest-point estimate within
    ~2 mm of MuJoCo's exact capsule-box for the reference pile shapes."""
    u = quat_rotate(q1, jnp.array([0.0, 0, 1.0], p1.dtype))
    r, hl = s1[0], s1[1]
    tmid = jnp.clip(jnp.dot(p2 - p1, u), -hl, hl)
    cands = jnp.stack([
        p1 + u * hl, p1 - u * hl,
        p1 + u * (0.5 * (hl + tmid)), p1 + u * (0.5 * (-hl + tmid)),
        p1 + u * tmid,
    ])

    def one(c):
        pos, n_w, dist = _sphere_box_core(c, r, p2, q2, s2)
        return pos, -n_w, dist

    pos, n, dist = jax.vmap(one)(cands)
    return pos, n, dist


# ---------------------------------------------------------------------------
# box-box (corner sampling, both directions)
# ---------------------------------------------------------------------------


def box_box(p1, q1, s1, p2, q2, s2):
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        p1.dtype,
    )
    R1, R2 = quat_to_mat(q1), quat_to_mat(q2)
    corners1 = p1 + (signs * s1) @ R1.T
    corners2 = p2 + (signs * s2) @ R2.T

    def corner_in_box(c, pb, qb, sb):
        c_l = quat_rotate_inv(qb, c - pb)
        face_d = sb - jnp.abs(c_l)               # >0 inside per axis
        inside = jnp.all(face_d > 0)
        k = jnp.argmin(face_d)
        sgn = jnp.sign(c_l[k]) + (c_l[k] == 0.0)
        n_l = jnp.zeros(3, c.dtype).at[k].set(sgn)
        dist = jnp.where(inside, -face_d[k], BIG)
        n_w = quat_rotate(qb, n_l)
        pos = c - 0.5 * dist * n_w * jnp.where(inside, 1.0, 0.0)
        return pos, n_w, dist

    pos_a, n_a, d_a = jax.vmap(lambda c: corner_in_box(c, p2, q2, s2))(corners1)
    pos_b, n_b, d_b = jax.vmap(lambda c: corner_in_box(c, p1, q1, s1))(corners2)
    # directions: corner of 1 inside 2 -> outward normal of 2 points from 2 to
    # 1, so normal(1->2) = -n; corner of 2 inside 1 -> normal(1->2) = +n
    neg_a, ia = jax.lax.top_k(-d_a, 4)
    neg_b, ib = jax.lax.top_k(-d_b, 4)
    pos_e, n_e, d_e = _box_box_edge(p1, R1, s1, p2, R2, s2)
    pos = jnp.concatenate([pos_a[ia], pos_b[ib], pos_e[None]])
    nrm = jnp.concatenate([-n_a[ia], n_b[ib], n_e[None]])
    dist = jnp.concatenate([-neg_a, -neg_b, d_e[None]])
    return pos, nrm, dist


def _box_box_edge(p1, R1, s1, p2, R2, s2):
    """Edge-edge SAT contact (the case corner sampling misses: crossed
    edges penetrating with no vertex inside either box — e.g. finger-box
    edge grasps). Evaluates all 15 SAT axes; emits one contact at the
    closest points of the two supporting edges when (a) no axis separates
    and (b) the minimum-penetration axis is one of the 9 cross axes.
    Returns (pos (3,), normal(1->2) (3,), dist ()); dist = BIG when the
    face cases (already covered by corner sampling) win or boxes separate."""
    d12 = p2 - p1
    A = R1.T  # rows = box1 axes in world
    B = R2.T
    axes_face = jnp.concatenate([A, B])                      # (6, 3)
    cross = jnp.cross(A[:, None, :], B[None, :, :]).reshape(9, 3)
    cnorm = jnp.linalg.norm(cross, axis=1)
    valid = cnorm > 1e-8                                     # parallel pairs
    cross_u = cross / jnp.maximum(cnorm, 1e-12)[:, None]
    axes = jnp.concatenate([axes_face, cross_u])             # (15, 3)

    def overlap(L):
        proj1 = jnp.abs(A @ L) @ s1
        proj2 = jnp.abs(B @ L) @ s2
        return jnp.abs(jnp.dot(d12, L)) - (proj1 + proj2)    # >0 = separated

    sep = jax.vmap(overlap)(axes)
    sep = jnp.where(jnp.concatenate([jnp.ones(6, bool), valid]), sep, -BIG)
    separated = jnp.any(sep > 0)
    pen = -sep                                               # >0 = overlap
    pen = jnp.where(jnp.concatenate([jnp.zeros(6, bool), ~valid]), BIG, pen)
    best = jnp.argmin(pen)
    edge_wins = best >= 6
    k = jnp.clip(best - 6, 0, 8)
    i, j = k // 3, k % 3
    L = cross_u[k]
    L = L * jnp.sign(jnp.dot(L, d12))                        # point 1 -> 2
    # supporting edge on box1: runs along A[i]; the other two axes take the
    # corner signs that push TOWARD box2 (+L side of box1)
    sg1 = jnp.sign(A @ L)
    e1_mid = p1 + ((jnp.where(jnp.arange(3) == i, 0.0, sg1) * s1) @ A)
    sg2 = jnp.sign(B @ L)
    e2_mid = p2 - ((jnp.where(jnp.arange(3) == j, 0.0, sg2) * s2) @ B)
    s_, t_ = _segment_closest(e1_mid, A[i], s1[i], e2_mid, B[j], s2[j])
    a = e1_mid + A[i] * s_
    b = e2_mid + B[j] * t_
    dist = jnp.where(separated | ~edge_wins, BIG, -pen[best])
    return 0.5 * (a + b), L, dist


# ---------------------------------------------------------------------------
# convex-hull narrowphase (mesh geoms)
#
# Mesh geoms collide through their convex hulls — the same representation
# MuJoCo's own mesh collider uses — stored as padded vertex sets + halfspace
# tables (Model.hull_*). Contacts are vertex-vs-face both ways: the signed
# distance of a point to a convex hull is max_f(n_f.x - d_f) (exact inside,
# a lower bound outside, so separation is never misreported as contact).
# Edge-edge crossings are not generated (documented deviation; vertex-face
# contacts dominate for the near-box gripper finger hulls and pile objects).
# All ops are dense (V x F) dot products — pure VPU work that vmaps over
# thousands of pairs and scenarios.
# ---------------------------------------------------------------------------


def _hull_world(p, q, verts, fnorm, fdist):
    """Transform mesh-frame hull to world: verts (V,3), faces {n.x <= d}."""
    R = quat_to_mat(q)
    vw = p + verts @ R.T
    nw = fnorm @ R.T
    dw = fdist + nw @ p
    return vw, nw, dw


def _verts_vs_faces(verts_w, vmask, nw, dw, k, pad_big):
    """Deepest-k vertices of a point cloud w.r.t. a halfspace hull.

    Padding faces carry d = +BIG so they never win the max; padded vertices
    are pushed to +BIG distance so they never enter the top-k.
    Returns (points (k,3), outward face normals (k,3), dists (k,)).
    """
    scores = verts_w @ nw.T - dw[None, :]            # (V, F)
    sdf = jnp.max(scores, axis=1)
    fidx = jnp.argmax(scores, axis=1)
    sdf = jnp.where(vmask > 0.5, sdf, pad_big)
    neg, idx = jax.lax.top_k(-sdf, k)
    dist = -neg
    v = verts_w[idx]
    nf = nw[fidx[idx]]
    pos = v - 0.5 * dist[:, None] * nf
    return pos, nf, dist


def hull_hull(p1, q1, v1, m1, n1, d1, p2, q2, v2, m2, n2, d2):
    """Generic convex-convex with a PAIR-CONSISTENT contact frame.

    Face-normal SAT: pick the single least-overlap axis over BOTH hulls'
    face normals, then emit the 8 deepest opposing vertices along that
    shared axis. An earlier formulation gave every vertex its own argmax
    face normal; under a firm two-finger pinch the fingers sink a few mm
    into the object, per-vertex argmaxes flip to SIDE faces of the finger
    hull between steps, and the resulting rotated contact forces launch
    the object (MuJoCo holds the same grasp with one stable frame per
    pair — mjc's convex narrowphase likewise computes a single direction
    per pair). Edge-edge axes are not enumerated (same approximation as
    before; box_box has its dedicated edge SAT)."""
    vw1, nw1, dw1 = _hull_world(p1, q1, v1, n1, d1)
    vw2, nw2, dw2 = _hull_world(p2, q2, v2, n2, d2)
    # least-overlap face axis across both hulls (padded faces carry
    # d=+BIG -> separation -BIG, never win; padded verts excluded by mask)
    s21 = jnp.where(m1[:, None] > 0.5, vw1 @ nw2.T, BIG)   # (V1, F2)
    sep2 = jnp.min(s21, axis=0) - dw2                      # (F2,)
    s12 = jnp.where(m2[:, None] > 0.5, vw2 @ nw1.T, BIG)
    sep1 = jnp.min(s12, axis=0) - dw1
    f2 = jnp.argmax(sep2)
    f1 = jnp.argmax(sep1)
    use2 = sep2[f2] >= sep1[f1]       # contact face lives on hull 2
    # verts of 1 against the chosen face of 2
    nA, dA = nw2[f2], dw2[f2]
    distA = jnp.where(m1 > 0.5, vw1 @ nA - dA, BIG)
    negA, idxA = jax.lax.top_k(-distA, 8)
    posA = vw1[idxA] - 0.5 * (-negA)[:, None] * nA
    # verts of 2 against the chosen face of 1
    nB, dB = nw1[f1], dw1[f1]
    distB = jnp.where(m2 > 0.5, vw2 @ nB - dB, BIG)
    negB, idxB = jax.lax.top_k(-distB, 8)
    posB = vw2[idxB] - 0.5 * (-negB)[:, None] * nB
    # normal convention (from geom1 into geom2): vertex of 1 on a face of 2
    # -> -outward_n2; vertex of 2 on a face of 1 -> +outward_n1
    pos = jnp.where(use2, posA, posB)
    nrm = jnp.broadcast_to(jnp.where(use2, -nA, nB), (8, 3))
    dist = jnp.where(use2, -negA, -negB)
    return pos, nrm, dist


def plane_hull(p1, q1, s1, p2, q2, v2, m2, n2, d2):
    # 8 deepest vertices: a flat-resting 16-gon prism (cylinder end) needs
    # its support polygon to contain the center of mass, which 4 tie-broken
    # adjacent rim vertices do not
    n = quat_rotate(q1, jnp.array([0.0, 0, 1.0], p1.dtype))
    R2 = quat_to_mat(q2)
    vw = p2 + v2 @ R2.T
    dvert = vw @ n - jnp.dot(n, p1)
    dvert = jnp.where(m2 > 0.5, dvert, BIG)
    neg, idx = jax.lax.top_k(-dvert, 8)
    dist = -neg
    pos = vw[idx] - 0.5 * dist[:, None] * n[None]
    return pos, jnp.broadcast_to(n, (8, 3)), dist


def _sphere_hull_point(c, r, nw, dw):
    scores = c @ nw.T - dw
    sdf = jnp.max(scores)
    nf = nw[jnp.argmax(scores)]
    dist = sdf - r
    pos = c - nf * (r + 0.5 * dist)
    return pos, -nf, dist


def sphere_hull(p1, q1, s1, p2, q2, v2, m2, n2, d2):
    _, nw, dw = _hull_world(p2, q2, v2, n2, d2)
    pos, nrm, dist = _sphere_hull_point(p1, s1[0], nw, dw)
    return pos[None], nrm[None], dist[None]


def capsule_hull(p1, q1, s1, p2, q2, v2, m2, n2, d2):
    """5 axis samples as spheres (endpoints, midpoints, center-nearest)."""
    vw, nw, dw = _hull_world(p2, q2, v2, n2, d2)
    center = jnp.sum(vw * (m2[:, None] > 0.5), axis=0) / jnp.maximum(
        jnp.sum(m2 > 0.5), 1
    )
    u = quat_rotate(q1, jnp.array([0.0, 0, 1.0], p1.dtype))
    r, hl = s1[0], s1[1]
    tmid = jnp.clip(jnp.dot(center - p1, u), -hl, hl)
    ts = jnp.stack([-hl, hl, tmid, 0.5 * (hl + tmid), 0.5 * (-hl + tmid)])
    return jax.vmap(lambda t: _sphere_hull_point(p1 + u * t, r, nw, dw))(ts)


def box_hull(p1, q1, s1, p2, q2, v2, m2, n2, d2):
    """Box treated as an 8-vertex/6-face hull -> generic hull-hull."""
    signs = jnp.array(
        [[sx, sy, sz] for sx in (-1, 1) for sy in (-1, 1) for sz in (-1, 1)],
        p1.dtype,
    )
    bv = signs * s1
    bn = jnp.concatenate([jnp.eye(3, dtype=p1.dtype), -jnp.eye(3, dtype=p1.dtype)])
    bd = jnp.concatenate([s1, s1])
    bm = jnp.ones(8, p1.dtype)
    return hull_hull(p1, q1, bv, bm, bn, bd, p2, q2, v2, m2, n2, d2)


# dispatch table: (type1, type2) -> (fn, n_points); types use mjcf enum values
from mujoco_rl_ur5_tpu.scene.mjcf import (  # noqa: E402
    GEOM_BOX, GEOM_CAPSULE, GEOM_MESH, GEOM_PLANE, GEOM_SPHERE,
)

NARROWPHASE = {
    (GEOM_PLANE, GEOM_SPHERE): (plane_sphere, 1),
    (GEOM_PLANE, GEOM_CAPSULE): (plane_capsule, 2),
    (GEOM_PLANE, GEOM_BOX): (plane_box, 4),
    (GEOM_SPHERE, GEOM_SPHERE): (sphere_sphere, 1),
    (GEOM_SPHERE, GEOM_CAPSULE): (sphere_capsule, 1),
    (GEOM_SPHERE, GEOM_BOX): (sphere_box, 1),
    (GEOM_CAPSULE, GEOM_CAPSULE): (capsule_capsule, 1),
    (GEOM_CAPSULE, GEOM_BOX): (capsule_box, 5),
    (GEOM_BOX, GEOM_BOX): (box_box, 9),
}

# hull pairs: geom2 is the mesh (GEOM_MESH is the largest enum, so canonical
# pair ordering always puts it second); signature gains the hull operand
# (verts, vmask, fnorm, fdist) after (p2, q2)
HULL_NARROWPHASE = {
    (GEOM_PLANE, GEOM_MESH): (plane_hull, 8),
    (GEOM_SPHERE, GEOM_MESH): (sphere_hull, 1),
    (GEOM_CAPSULE, GEOM_MESH): (capsule_hull, 5),
    (GEOM_BOX, GEOM_MESH): (box_hull, 8),
    (GEOM_MESH, GEOM_MESH): (hull_hull, 8),
}


def pair_points(t1: int, t2: int) -> int:
    """Candidate contact points generated per pair of collision types."""
    if (t1, t2) in NARROWPHASE:
        return NARROWPHASE[(t1, t2)][1]
    return HULL_NARROWPHASE[(t1, t2)][1]
