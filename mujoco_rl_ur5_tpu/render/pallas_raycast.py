"""Pallas TPU kernel: fused z-buffer ray-cast over all scene geoms.

The jnp raycaster (render/raycast.py) materializes the full per-geom
intersection tensors in HBM — s (N, G) plus world normals (N, G, 3); at
200x200x70 geoms that is ~45 MB of HBM traffic per frame and it dominates
render time. This kernel streams the geom loop in VMEM instead: each pixel
block keeps only the RUNNING minimum (s*, geom id*, world normal*), so HBM
sees one read of the rays and one write of the result — speed-of-light for
this op (arithmetic: ~70 geoms x ~30 VPU flops per ray).

Layout: rays are processed in (8, 128) f32 blocks (the native VPU tile);
the x/y/z components are separate (N/128, 128) arrays so every lane is a
ray. Geom parameters (rotation rows, position, size, type, hull faces) are
tiny and live fully in VMEM/SMEM; the per-geom loop is a `fori_loop` with
`lax.switch` on the geom type — the type is scalar per iteration, so the
switch is a real uniform branch, not a predicated blend.

Parity: intersection math mirrors raycast.py's per-type functions 1:1
(same miss sentinel BIG, same visibility conventions); equality with the
jnp path is gated in tests/test_pallas.py (interpret mode on CPU, compiled
on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_rl_ur5_tpu.physics.kinematics import Kin, geom_poses
from mujoco_rl_ur5_tpu.ops.spatial import quat_to_mat
from mujoco_rl_ur5_tpu.scene.mjcf import (
    GEOM_BOX, GEOM_CAPSULE, GEOM_CYLINDER, GEOM_MESH, GEOM_PLANE, GEOM_SPHERE,
)
from mujoco_rl_ur5_tpu.scene.model import Model

BIG = 1e10
_SUB, _LANE = 8, 128
_TILE = _SUB * _LANE

# type codes -> switch branch index
_BRANCH = {GEOM_PLANE: 0, GEOM_SPHERE: 1, GEOM_BOX: 2, GEOM_CAPSULE: 3,
           GEOM_CYLINDER: 4, GEOM_MESH: 5}


def _kernel(gtype_ref, par_ref, face_ref, dx_ref, dy_ref, dz_ref,
            s_ref, gid_ref, nx_ref, ny_ref, nz_ref, *, ngeom, nface):
    """par_ref: (G, 16) f32 [R row-major 9 | pos_local 3 | size 3 | pad];
    pos_local = R^T(cam - gpos) precomputed on host side of the call.
    face_ref: (G, nface, 4) f32 [face normal 3 | face dist] (meshes only;
    others zero). gtype_ref: (G,) int32 in SMEM (branch index, -1 = skip)."""
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]

    def geom_body(g, carry):
        s_min, gid, nx, ny, nz = carry
        p = par_ref[g, :]
        R00, R01, R02 = p[0], p[1], p[2]
        R10, R11, R12 = p[3], p[4], p[5]
        R20, R21, R22 = p[6], p[7], p[8]
        ox, oy, oz = p[9], p[10], p[11]
        s0, s1, s2 = p[12], p[13], p[14]
        # local ray dirs: d_l = R^T d  (R maps local -> world)
        dlx = R00 * dx + R10 * dy + R20 * dz
        dly = R01 * dx + R11 * dy + R21 * dz
        dlz = R02 * dx + R12 * dy + R22 * dz

        def plane(_):
            s = jnp.where(jnp.abs(dlz) > 1e-12, -oz / dlz, BIG)
            s = jnp.where((s > 0) & (oz > 0), s, BIG)
            one = jnp.ones_like(s)
            return s, 0.0 * one, 0.0 * one, one

        def sphere(_):
            a = dlx * dlx + dly * dly + dlz * dlz
            b = 2.0 * (ox * dlx + oy * dly + oz * dlz)
            c = ox * ox + oy * oy + oz * oz - s0 * s0
            disc = b * b - 4.0 * a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            s = (-b - sq) / (2.0 * a)
            s = jnp.where((disc > 0) & (s > 0), s, BIG)
            px, py, pz = ox + s * dlx, oy + s * dly, oz + s * dlz
            inv = jax.lax.rsqrt(
                jnp.maximum(px * px + py * py + pz * pz, 1e-24))
            return s, px * inv, py * inv, pz * inv

        def box(_):
            def slab(o, d, h):
                dinv = jnp.where(jnp.abs(d) > 1e-12, 1.0 / d, BIG)
                t1 = (-h - o) * dinv
                t2 = (h - o) * dinv
                return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

            l0, u0 = slab(ox, dlx, s0)
            l1, u1 = slab(oy, dly, s1)
            l2, u2 = slab(oz, dlz, s2)
            t_in = jnp.maximum(l0, jnp.maximum(l1, l2))
            t_out = jnp.minimum(u0, jnp.minimum(u1, u2))
            hit = (t_in <= t_out) & (t_out > 0) & (t_in > 0)
            s = jnp.where(hit, t_in, BIG)
            # face normal = axis of the entering slab, against the ray
            is0 = (l0 >= l1) & (l0 >= l2)
            is1 = (~is0) & (l1 >= l2)
            nx_ = jnp.where(is0, -jnp.sign(dlx), 0.0)
            ny_ = jnp.where(is1, -jnp.sign(dly), 0.0)
            nz_ = jnp.where(is0 | is1, 0.0, -jnp.sign(dlz))
            return s, nx_, ny_, nz_

        def _cyl_side():
            a = dlx * dlx + dly * dly
            b = 2.0 * (ox * dlx + oy * dly)
            c = ox * ox + oy * oy - s0 * s0
            disc = b * b - 4.0 * a * c
            sq = jnp.sqrt(jnp.maximum(disc, 0.0))
            s = jnp.where(a > 1e-12, (-b - sq) / (2.0 * jnp.maximum(a, 1e-12)),
                          BIG)
            return jnp.where((disc > 0) & (s > 0), s, BIG)

        def capsule(_):
            hl = s1
            s_side = _cyl_side()
            zhit = oz + s_side * dlz
            s_side = jnp.where(jnp.abs(zhit) <= hl, s_side, BIG)

            def cap(cz):
                b = 2.0 * (ox * dlx + oy * dly + (oz - cz) * dlz)
                c = ox * ox + oy * oy + (oz - cz) * (oz - cz) - s0 * s0
                a = dlx * dlx + dly * dly + dlz * dlz
                disc = b * b - 4.0 * a * c
                sq = jnp.sqrt(jnp.maximum(disc, 0.0))
                s = (-b - sq) / (2.0 * a)
                pz = (oz - cz) + s * dlz
                ok = (disc > 0) & (s > 0) & (pz * jnp.sign(cz) > 0)
                return jnp.where(ok, s, BIG)

            s = jnp.minimum(s_side, jnp.minimum(cap(hl), cap(-hl)))
            px, py, pz = ox + s * dlx, oy + s * dly, oz + s * dlz
            az = jnp.clip(pz, -hl, hl)
            nx_, ny_, nz_ = px, py, pz - az
            inv = jax.lax.rsqrt(
                jnp.maximum(nx_ * nx_ + ny_ * ny_ + nz_ * nz_, 1e-24))
            return s, nx_ * inv, ny_ * inv, nz_ * inv

        def cylinder(_):
            hl = s1
            s_side = _cyl_side()
            zhit = oz + s_side * dlz
            s_side = jnp.where(jnp.abs(zhit) <= hl, s_side, BIG)
            sgn = -jnp.sign(dlz)
            s_disc = jnp.where(jnp.abs(dlz) > 1e-12, (sgn * hl - oz) / dlz,
                               BIG)
            px = ox + s_disc * dlx
            py = oy + s_disc * dly
            ok = (s_disc > 0) & (px * px + py * py <= s0 * s0)
            s_disc = jnp.where(ok, s_disc, BIG)
            s = jnp.minimum(s_side, s_disc)
            hx, hy = ox + s * dlx, oy + s * dly
            inv = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy, 1e-24))
            disc_win = s_disc < s_side
            nx_ = jnp.where(disc_win, 0.0, hx * inv)
            ny_ = jnp.where(disc_win, 0.0, hy * inv)
            nz_ = jnp.where(disc_win, sgn, 0.0)
            return s, nx_, ny_, nz_

        def hull(_):
            # NOTE: all loop carries are f32 vectors — Mosaic cannot
            # legalize vector<i1> carries in scf.for (out_par is 0/1 f32)
            def face_body(f, c):
                t_in, t_out, out_par, bnx, bny, bnz = c
                fr = face_ref[g, f, :]
                fnx, fny, fnz, fd = fr[0], fr[1], fr[2], fr[3]
                nd = fnx * dlx + fny * dly + fnz * dlz
                no = fnx * ox + fny * oy + fnz * oz
                t = jnp.where(jnp.abs(nd) > 1e-12, (fd - no) / nd, 0.0)
                t_ent = jnp.where(nd < -1e-12, t, -BIG)
                better = t_ent > t_in
                bnx = jnp.where(better, fnx, bnx)
                bny = jnp.where(better, fny, bny)
                bnz = jnp.where(better, fnz, bnz)
                t_in = jnp.maximum(t_in, t_ent)
                t_out = jnp.minimum(t_out,
                                    jnp.where(nd > 1e-12, t, BIG))
                out_par = jnp.maximum(
                    out_par,
                    jnp.where((jnp.abs(nd) <= 1e-12) & (no > fd), 1.0, 0.0))
                return t_in, t_out, out_par, bnx, bny, bnz

            z = jnp.zeros_like(dlx)
            t_in, t_out, out_par, bnx, bny, bnz = jax.lax.fori_loop(
                0, nface, face_body,
                (jnp.full_like(dlx, -BIG), jnp.full_like(dlx, BIG),
                 z, z, z, z))
            hit = (t_in <= t_out) & (t_in > 0) & (out_par < 0.5)
            s = jnp.where(hit, t_in, BIG)
            return s, bnx, bny, bnz

        branch = gtype_ref[g]
        s, nlx, nly, nlz = jax.lax.switch(
            jnp.maximum(branch, 0),
            [plane, sphere, box, capsule, cylinder, hull], None)
        s = jnp.where(branch < 0, BIG, s)    # hidden/disabled geom

        better = s < s_min
        gid = jnp.where(better, g, gid)
        # world normal: n_w = R n_l
        nx = jnp.where(better, R00 * nlx + R01 * nly + R02 * nlz, nx)
        ny = jnp.where(better, R10 * nlx + R11 * nly + R12 * nlz, ny)
        nz = jnp.where(better, R20 * nlx + R21 * nly + R22 * nlz, nz)
        return jnp.minimum(s_min, s), gid, nx, ny, nz

    s0 = jnp.full(dx.shape, BIG, dx.dtype)
    gid0 = jnp.zeros(dx.shape, jnp.int32)
    z0 = jnp.zeros(dx.shape, dx.dtype)
    s, gid, nx, ny, nz = jax.lax.fori_loop(
        0, ngeom, geom_body, (s0, gid0, z0, z0, z0))
    s_ref[:] = s
    gid_ref[:] = gid
    nx_ref[:] = nx
    ny_ref[:] = ny
    nz_ref[:] = nz


def pack_geoms(model: Model, kin: Kin, cam_pos, hidden_geoms=()):
    """Host/trace-side packing of per-geom parameters for the kernel.
    Returns (gtype (G,) i32 branch codes, par (G, 16) f32, face (G, F, 4))."""
    t = model.topo
    gpos, gquat = geom_poses(model, kin)           # traced (G, 3), (G, 4)
    R = jax.vmap(quat_to_mat)(gquat)               # (G, 3, 3) local->world
    o_l = jnp.einsum("gij,gi->gj", R, cam_pos[None] - gpos)  # R^T (cam-p)
    G = len(t.geom_type)
    par = jnp.concatenate([
        R.reshape(G, 9), o_l, model.geom_size[:, :3],
        jnp.zeros((G, 4), R.dtype)], axis=1)[:, :16]

    branch = np.array([_BRANCH[int(ty)] for ty in t.geom_type], np.int32)
    # convert the CONCRETE model array to numpy BEFORE indexing — indexing
    # first would build a tracer under jit and break the host-side masking
    alpha = np.asarray(model.geom_rgba)[:, 3]
    branch = np.where(alpha > 0.01, branch, -1)
    if len(hidden_geoms):
        branch[np.asarray(hidden_geoms)] = -1

    F = model.hull_fnorm.shape[1]
    face = jnp.zeros((G, F, 4), R.dtype)
    mesh_ids = np.nonzero(t.geom_type == GEOM_MESH)[0]
    if len(mesh_ids):
        mid = t.geom_meshid[mesh_ids]
        fn = model.hull_fnorm[mid]                 # (M, F, 3)
        fd = model.hull_fdist[mid][..., None]      # (M, F, 1)
        face = face.at[mesh_ids].set(jnp.concatenate([fn, fd], axis=-1))
    return jnp.asarray(branch), par, face


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cast(gtype, par, face, dx, dy, dz, interpret=False):
    ngeom, nface = face.shape[0], face.shape[1]
    rows = dx.shape[0]
    grid = (rows // _SUB,)
    tile = lambda: pl.BlockSpec((_SUB, _LANE), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)
    full = lambda shape: pl.BlockSpec(
        shape, lambda i: tuple(0 for _ in shape), memory_space=pltpu.VMEM)
    kernel = functools.partial(_kernel, ngeom=ngeom, nface=nface)
    out_shape = [
        jax.ShapeDtypeStruct(dx.shape, dx.dtype),      # s
        jax.ShapeDtypeStruct(dx.shape, jnp.int32),     # gid
        jax.ShapeDtypeStruct(dx.shape, dx.dtype),      # nx
        jax.ShapeDtypeStruct(dx.shape, dx.dtype),      # ny
        jax.ShapeDtypeStruct(dx.shape, dx.dtype),      # nz
    ]
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),     # gtype (G,)
            full(par.shape),                           # par (G, 16)
            full(face.shape),                          # face (G, F, 4)
            tile(), tile(), tile(),
        ],
        out_specs=[tile()] * 5,
        out_shape=out_shape,
        interpret=interpret,
    )(gtype, par, face, dx, dy, dz)


def cast_rays(model: Model, kin: Kin, cam_pos, dirs, hidden_geoms=(),
              interpret: bool = False):
    """Fused min-cast: unit rays (N, 3) from `cam_pos` -> per-ray
    (s*, gid*, n_world*) with N padded internally to the (8, 128) tile.
    Drop-in substitute for raycast._cast_all + its argmin/gather."""
    gtype, par, face = pack_geoms(model, kin, cam_pos, hidden_geoms)
    N = dirs.shape[0]
    rows = -(-N // _TILE) * _SUB
    pad = rows * _LANE - N
    d = jnp.pad(dirs, ((0, pad), (0, 0)), constant_values=1.0)
    dx = d[:, 0].reshape(rows, _LANE)
    dy = d[:, 1].reshape(rows, _LANE)
    dz = d[:, 2].reshape(rows, _LANE)
    s, gid, nx, ny, nz = _cast(gtype, par, face, dx, dy, dz,
                               interpret=interpret)
    flat = lambda a: a.reshape(-1)[:N]
    n = jnp.stack([flat(nx), flat(ny), flat(nz)], axis=-1)
    return flat(s), flat(gid), n
