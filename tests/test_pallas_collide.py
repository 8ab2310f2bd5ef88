"""Gate physics/pallas_collide.py kernels against physics/collision.py.

Each batch-in-lanes kernel must reproduce the reference jnp narrowphase
(same math, same tie-breaks) on random poses — compared contact-for-contact
after sorting both sides by signed distance (the kernels reproduce
lax.top_k's stable order, but sorting keeps the gate robust to fp ties).
Runs in Pallas interpret mode on the CPU backend.
"""

import os

import numpy as np
import pytest

os.environ.setdefault("MJTPU_PALLAS_COLLIDE", "0")

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.physics import collision, pallas_collide

B, N = 5, 7


def _rand_quat(rng, shape):
    q = rng.normal(size=shape + (4,))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def _rand_pose(rng, spread=0.15):
    p = rng.uniform(-spread, spread, size=(B, N, 3)).astype(np.float32)
    q = _rand_quat(rng, (B, N)).astype(np.float32)
    return jnp.asarray(p), jnp.asarray(q)


def _rand_hull(rng, V=12, F=0, pad_to=16, fpad_to=24):
    """Random convex hulls as padded vert + halfspace tables (per B, N)."""
    from scipy.spatial import ConvexHull

    verts = np.zeros((B, N, pad_to, 3), np.float32)
    vmask = np.zeros((B, N, pad_to), np.float32)
    fnorm = np.zeros((B, N, fpad_to, 3), np.float32)
    fdist = np.full((B, N, fpad_to), 1e10, np.float32)
    for b in range(B):
        for n in range(N):
            pts = rng.uniform(-0.08, 0.08, size=(V, 3))
            hull = ConvexHull(pts)
            hv = pts[hull.vertices]
            nv = len(hv)
            verts[b, n, :nv] = hv
            vmask[b, n, :nv] = 1.0
            # halfspaces: equations are n.x + d <= 0 -> n.x <= -d
            eq = hull.equations
            nf = min(len(eq), fpad_to)
            fnorm[b, n, :nf] = eq[:nf, :3]
            fdist[b, n, :nf] = -eq[:nf, 3]
    return (jnp.asarray(verts), jnp.asarray(vmask),
            jnp.asarray(fnorm), jnp.asarray(fdist))


def _sorted_by_dist(pos, nrm, dist):
    """Sort the K contacts of each (b, n) slot by (dist, pos-lex)."""
    key = np.asarray(dist, np.float64).copy()
    order = np.argsort(key, axis=-1, kind="stable")
    take = lambda a: np.take_along_axis(np.asarray(a), order[..., None], 2)
    return (take(pos), take(nrm),
            np.take_along_axis(np.asarray(dist), order, 2))


def _check(ref_out, ker_out, atol=2e-5):
    rp, rn, rd = _sorted_by_dist(*ref_out)
    kp, kn, kd = _sorted_by_dist(*ker_out)
    act = rd < 1.0  # only compare real candidates, not BIG padding
    np.testing.assert_allclose(np.where(act, kd, 0), np.where(act, rd, 0),
                               atol=atol)
    m = act[..., None]
    np.testing.assert_allclose(np.where(m, kp, 0), np.where(m, rp, 0),
                               atol=atol)
    np.testing.assert_allclose(np.where(m, kn, 0), np.where(m, rn, 0),
                               atol=atol)


def test_box_box_kernel_matches_reference():
    rng = np.random.default_rng(0)
    p1, q1 = _rand_pose(rng)
    p2, q2 = _rand_pose(rng)
    s1 = jnp.asarray(rng.uniform(0.03, 0.12, (B, N, 3)).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0.03, 0.12, (B, N, 3)).astype(np.float32))
    ref = jax.vmap(jax.vmap(collision.box_box))(p1, q1, s1, p2, q2, s2)
    ker = pallas_collide.box_box_batched(p1, q1, s1, p2, q2, s2)
    _check(ref, ker)


def test_hull_hull_kernel_matches_reference():
    pytest.importorskip("scipy")
    rng = np.random.default_rng(1)
    p1, q1 = _rand_pose(rng, spread=0.1)
    p2, q2 = _rand_pose(rng, spread=0.1)
    h1 = _rand_hull(rng)
    h2 = _rand_hull(rng)
    ref = jax.vmap(jax.vmap(collision.hull_hull))(p1, q1, *h1, p2, q2, *h2)
    ker = pallas_collide.hull_hull_batched(p1, q1, *h1, p2, q2, *h2)
    _check(ref, ker)


def test_box_hull_kernel_matches_reference():
    pytest.importorskip("scipy")
    rng = np.random.default_rng(2)
    p1, q1 = _rand_pose(rng, spread=0.1)
    p2, q2 = _rand_pose(rng, spread=0.1)
    s1 = jnp.asarray(rng.uniform(0.03, 0.12, (B, N, 3)).astype(np.float32))
    h2 = _rand_hull(rng)
    ref = jax.vmap(jax.vmap(collision.box_hull))(p1, q1, s1, p2, q2, *h2)
    ker = pallas_collide.box_hull_batched(p1, q1, s1, p2, q2, *h2)
    _check(ref, ker)


def test_plane_sphere_capsule_hull_kernels_match_reference():
    pytest.importorskip("scipy")
    rng = np.random.default_rng(3)
    h2 = _rand_hull(rng)
    # plane: identity-ish quats so the hulls straddle the plane
    p1 = jnp.asarray(rng.uniform(-0.05, 0.0, (B, N, 3)).astype(np.float32))
    q1 = jnp.asarray(_rand_quat(rng, (B, N)).astype(np.float32))
    p2, q2 = _rand_pose(rng, spread=0.08)
    s1 = jnp.asarray(rng.uniform(0.02, 0.08, (B, N, 3)).astype(np.float32))
    ref = jax.vmap(jax.vmap(collision.plane_hull))(p1, q1, s1, p2, q2, *h2)
    ker = pallas_collide.plane_hull_batched(p1, q1, s1, p2, q2, *h2)
    _check(ref, ker)
    ref = jax.vmap(jax.vmap(collision.sphere_hull))(p1, q1, s1, p2, q2, *h2)
    ker = pallas_collide.sphere_hull_batched(p1, q1, s1, p2, q2, *h2)
    _check(ref, ker)
    ref = jax.vmap(jax.vmap(collision.capsule_hull))(p1, q1, s1, p2, q2, *h2)
    ker = pallas_collide.capsule_hull_batched(p1, q1, s1, p2, q2, *h2)
    _check(ref, ker)


def test_dispatch_uses_kernel_under_vmap(monkeypatch):
    """collide()'s dispatch: forced-on Pallas (interpret) == reference."""
    monkeypatch.setenv("MJTPU_PALLAS_COLLIDE", "1")
    rng = np.random.default_rng(4)
    p1, q1 = _rand_pose(rng)
    p2, q2 = _rand_pose(rng)
    s1 = jnp.asarray(rng.uniform(0.03, 0.12, (B, N, 3)).astype(np.float32))
    s2 = jnp.asarray(rng.uniform(0.03, 0.12, (B, N, 3)).astype(np.float32))
    out = jax.vmap(
        lambda a, b, c, d, e, f: pallas_collide.dispatch(
            collision.GEOM_BOX, collision.GEOM_BOX, a, b, c, d, e, f)
    )(p1, q1, s1, p2, q2, s2)
    ref = jax.vmap(jax.vmap(collision.box_box))(p1, q1, s1, p2, q2, s2)
    _check(ref, out)
    # and the per-scenario (unbatched) path still gives reference results
    one = pallas_collide.dispatch(
        collision.GEOM_BOX, collision.GEOM_BOX,
        p1[0], q1[0], s1[0], p2[0], q2[0], s2[0])
    _check(tuple(o[0:1] for o in ref),
           tuple(np.asarray(o)[None] for o in one))
