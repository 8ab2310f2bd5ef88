"""Analytic ray-casting of scene geoms -> depth + flat-shaded RGB.

TPU-native replacement for the GL offscreen render that produces the agent's
entire observation (MujocoController.py:708-727). Every pixel ray is
intersected against every geom (H*W x ngeom dense ops — pure VPU work; a
200x200x70 frame is ~3M intersection tests, microseconds on a TPU core), the
nearest hit wins the z-buffer. Mesh geoms are cast against their convex hulls
(the same shape they collide as). RGB is flat-shaded Lambertian with a
camera headlight — observation textures are not reproduced (the policy is
trained inside this framework; only depth must be geometrically faithful for
pixel_2_world action decoding, GraspingEnv.py:100-102).

Returned images follow get_image_data's flips (np.fliplr(np.flipud(.)),
MujocoController.py:727) so downstream pixel conventions match the reference.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_rl_ur5_tpu.ops.spatial import quat_rotate_inv, quat_to_mat
from mujoco_rl_ur5_tpu.physics.kinematics import Kin, geom_poses
from mujoco_rl_ur5_tpu.render.camera import Camera, camera_rays, encode_depth
from mujoco_rl_ur5_tpu.scene.mjcf import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_MESH, GEOM_PLANE, GEOM_SPHERE,
)
from mujoco_rl_ur5_tpu.scene.model import Model

BIG = 1e10


# ---------------------------------------------------------------------------
# per-type ray intersections: rays are given in the GEOM frame
# (o + s*d, s > 0); each returns (s_hit, normal_local) with s = BIG on miss
# ---------------------------------------------------------------------------


def _ray_plane(o, d, size):
    # plane z = 0, visible from +z side
    s = jnp.where(jnp.abs(d[2]) > 1e-12, -o[2] / d[2], BIG)
    s = jnp.where((s > 0) & (o[2] > 0), s, BIG)
    return s, jnp.array([0.0, 0, 1.0], o.dtype)


def _ray_sphere(o, d, size):
    r = size[0]
    a = jnp.dot(d, d)
    b = 2.0 * jnp.dot(o, d)
    c = jnp.dot(o, o) - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s = (-b - sq) / (2 * a)
    s = jnp.where((disc > 0) & (s > 0), s, BIG)
    n = o + s * d
    return s, n / jnp.maximum(jnp.linalg.norm(n), 1e-12)


def _ray_box(o, d, size):
    dinv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, BIG)
    t1 = (-size - o) * dinv
    t2 = (size - o) * dinv
    tmin = jnp.minimum(t1, t2)
    tmax = jnp.maximum(t1, t2)
    t_in = jnp.max(tmin)
    t_out = jnp.min(tmax)
    hit = (t_in <= t_out) & (t_out > 0) & (t_in > 0)
    s = jnp.where(hit, t_in, BIG)
    k = jnp.argmax(tmin)
    n = jnp.zeros(3, o.dtype).at[k].set(-jnp.sign(d[k]))
    return s, n


def _ray_cyl_side(o, d, r):
    a = d[0] * d[0] + d[1] * d[1]
    b = 2.0 * (o[0] * d[0] + o[1] * d[1])
    c = o[0] * o[0] + o[1] * o[1] - r * r
    disc = b * b - 4 * a * c
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    s = jnp.where(a > 1e-12, (-b - sq) / (2 * jnp.maximum(a, 1e-12)), BIG)
    return jnp.where((disc > 0) & (s > 0), s, BIG)


def _ray_capsule(o, d, size):
    r, hl = size[0], size[1]
    s_side = _ray_cyl_side(o, d, r)
    z = o[2] + s_side * d[2]
    s_side = jnp.where(jnp.abs(z) <= hl, s_side, BIG)

    def cap(center):
        oc = o - center
        b = 2.0 * jnp.dot(oc, d)
        c = jnp.dot(oc, oc) - r * r
        a = jnp.dot(d, d)
        disc = b * b - 4 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        s = (-b - sq) / (2 * a)
        p = oc + s * d
        ok = (disc > 0) & (s > 0) & (p[2] * jnp.sign(center[2]) > 0)
        return jnp.where(ok, s, BIG)

    top = jnp.array([0.0, 0, hl], o.dtype)
    s = jnp.minimum(s_side, jnp.minimum(cap(top), cap(-top)))
    p = o + s * d
    axis_p = jnp.array([0.0, 0, jnp.clip(p[2], -hl, hl)], o.dtype)
    n = p - axis_p
    return s, n / jnp.maximum(jnp.linalg.norm(n), 1e-12)


def _ray_cylinder(o, d, size):
    r, hl = size[0], size[1]
    s_side = _ray_cyl_side(o, d, r)
    z = o[2] + s_side * d[2]
    s_side = jnp.where(jnp.abs(z) <= hl, s_side, BIG)
    # end discs
    sgn = -jnp.sign(d[2])
    s_disc = jnp.where(jnp.abs(d[2]) > 1e-12, (sgn * hl - o[2]) / d[2], BIG)
    p = o + s_disc * d
    ok = (s_disc > 0) & (p[0] ** 2 + p[1] ** 2 <= r * r)
    s_disc = jnp.where(ok, s_disc, BIG)
    s = jnp.minimum(s_side, s_disc)
    phit = o + s * d
    n_side = jnp.array([phit[0], phit[1], 0.0], o.dtype)
    n_side = n_side / jnp.maximum(jnp.linalg.norm(n_side), 1e-12)
    n = jnp.where(s_disc < s_side, jnp.array([0.0, 0, 1.0], o.dtype) * sgn, n_side)
    return s, n


def _ray_hull(o, d, fnorm, fdist):
    """Convex polytope {n.x <= dist}: entering-plane max vs exiting-plane min.
    Padded faces (dist = +BIG) impose no constraint."""
    nd = fnorm @ d
    no = fnorm @ o
    t = jnp.where(jnp.abs(nd) > 1e-12, (fdist - no) / nd, 0.0)
    t_in = jnp.max(jnp.where(nd < -1e-12, t, -BIG))
    t_out = jnp.min(jnp.where(nd > 1e-12, t, BIG))
    # parallel ray outside any face -> miss
    outside_parallel = jnp.any((jnp.abs(nd) <= 1e-12) & (no > fdist))
    hit = (t_in <= t_out) & (t_in > 0) & ~outside_parallel
    s = jnp.where(hit, t_in, BIG)
    k = jnp.argmax(jnp.where(nd < -1e-12, t, -BIG))
    return s, fnorm[k]


# ---------------------------------------------------------------------------
# scene casting
# ---------------------------------------------------------------------------


def _cast_all(model: Model, kin: Kin, origin, dirs):
    """Intersect rays (N, 3) against every geom -> (s (N, G), n_world (N, G, 3)).

    Rays are transformed into each geom's frame (one shared origin, so the
    transform is a single 3-vector + an (N, 3) rotation); per-type dispatch is
    static over Topology.geom_type, grouped so each type is one vmapped batch.
    """
    t = model.topo
    gpos, gquat = geom_poses(model, kin)
    FNS = {
        GEOM_PLANE: _ray_plane, GEOM_SPHERE: _ray_sphere, GEOM_BOX: _ray_box,
        GEOM_CAPSULE: _ray_capsule, GEOM_CYLINDER: _ray_cylinder,
    }
    s_all = []
    n_all = []
    order = []
    for gtype in sorted(set(int(x) for x in t.geom_type)):
        ids = np.nonzero(t.geom_type == gtype)[0].astype(np.int32)
        order.extend(ids.tolist())
        p, q = gpos[ids], gquat[ids]                   # (G, 3), (G, 4)
        if gtype == GEOM_MESH:
            mid = t.geom_meshid[ids]
            fnorm, fdist = model.hull_fnorm[mid], model.hull_fdist[mid]

            def one(p_, q_, fn_, fd_):
                o_l = quat_rotate_inv(q_, origin - p_)
                R = quat_to_mat(q_)
                d_l = dirs @ R
                s, n_l = jax.vmap(lambda dd: _ray_hull(o_l, dd, fn_, fd_))(d_l)
                return s, n_l @ R.T

            s, n_w = jax.vmap(one)(p, q, fnorm, fdist)  # (G, N), (G, N, 3)
        else:
            fn = FNS[gtype]
            size = model.geom_size[ids]

            def one(p_, q_, sz_):
                o_l = quat_rotate_inv(q_, origin - p_)
                R = quat_to_mat(q_)
                d_l = dirs @ R
                s, n_l = jax.vmap(lambda dd: fn(o_l, dd, sz_))(d_l)
                return s, n_l @ R.T

            s, n_w = jax.vmap(one)(p, q, size)
        s_all.append(s)
        n_all.append(n_w)
    s = jnp.concatenate(s_all, axis=0)                 # (G_total, N)
    n = jnp.concatenate(n_all, axis=0)
    inv = np.argsort(np.asarray(order))
    return s[inv].T, n[inv].transpose(1, 0, 2)


def render_rgbd(model: Model, kin: Kin, cam: Camera, hidden_geoms=(),
                use_pallas: bool | None = None):
    """Render (rgb uint8 (H, W, 3), depth_buffer f32 (H, W)) with the
    reference's image flips applied. `hidden_geoms`: geom ids to skip (e.g.
    rgba alpha 0 markers).

    `use_pallas=None` auto-selects the fused Pallas min-cast kernel
    (render/pallas_raycast.py) on TPU backends and the pure-jnp path
    elsewhere; pass True/False to force."""
    t = model.topo
    dirs = camera_rays(cam).reshape(-1, 3)                  # (N, 3)
    norm = jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    dn = dirs / norm
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    if use_pallas:
        from mujoco_rl_ur5_tpu.render.pallas_raycast import cast_rays

        s_star, g_star, nrm = cast_rays(model, kin, cam.pos, dn,
                                        hidden_geoms=hidden_geoms)
    else:
        s, n_w = _cast_all(model, kin, cam.pos, dn)         # s along unit dirs
        # hidden geoms (and alpha=0) never win the z-buffer
        alpha = model.geom_rgba[:, 3]
        mask = jnp.asarray(alpha > 0.01, s.dtype)
        if len(hidden_geoms):
            mask = mask.at[np.asarray(hidden_geoms)].set(0.0)
        s = jnp.where(mask[None, :] > 0.5, s, BIG)
        g_star = jnp.argmin(s, axis=1)
        s_star = jnp.min(s, axis=1)
        nrm = jnp.take_along_axis(
            n_w, g_star[:, None, None].repeat(3, -1), 1)[:, 0]
    # planar eye depth: s was along unit rays; z_cam = s * (unit dir . forward)
    fwd = -cam.rot[:, 2]
    zdepth = s_star * (dn @ fwd)
    zdepth = jnp.clip(zdepth, cam.near, cam.far)
    dbuf = encode_depth(cam, zdepth)

    # flat Lambertian shading with camera headlight
    lambert = jnp.abs(nrm @ fwd)
    base = model.geom_rgba[g_star, :3]
    shade = base * (0.35 + 0.65 * lambert[:, None])
    hit = (s_star < BIG / 2)[:, None]
    rgb = jnp.where(hit, shade, jnp.array([0.12, 0.15, 0.2]))
    rgb = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)

    H, W = cam.height, cam.width
    rgb = rgb.reshape(H, W, 3)
    dbuf = dbuf.reshape(H, W)
    # reference flips: np.fliplr(np.flipud(img)) == [::-1, ::-1]
    return rgb[::-1, ::-1], dbuf[::-1, ::-1]


def render_depth(model: Model, kin: Kin, cam: Camera):
    """Depth-only render -> metric eye depth (H, W), flipped like the ref."""
    _, dbuf = render_rgbd(model, kin, cam)
    from mujoco_rl_ur5_tpu.render.camera import depth_2_meters

    return depth_2_meters(cam, dbuf)
