"""Forward kinematics + per-dof motion subspaces (batched, jit/vmap-safe).

Replaces the mujoco_py FK the reference reads through ``sim.data.body_xpos/
body_xmat/body_xquat`` (/root/reference/gym_grasper/controller/
MujocoController.py:487-489, :747-750). Design: all per-body work is scheduled
by compile-time *levels* (parent-before-child), so the traced program is a
fixed stack of gather/compute/scatter ops with no data-dependent control flow;
`vmap` adds the scenario batch axis on the left.

Spatial quantities (cdof, inertias, velocities) are expressed in world axes
about a per-tree origin (the tree root body position) — trees never mix in
smooth dynamics, and a near origin keeps float32 well-conditioned (MuJoCo uses
the subtree COM for the same reason).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_rl_ur5_tpu.ops.spatial import (
    quat_from_axis_angle, quat_mul, quat_normalize, quat_rotate, quat_to_mat,
)
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_BALL, JNT_FREE, JNT_HINGE, JNT_SLIDE
from mujoco_rl_ur5_tpu.scene.model import Model


@struct.dataclass
class Kin:
    """World-frame kinematic quantities for one scenario."""

    xpos: jax.Array      # (nbody, 3) body frame origins
    xquat: jax.Array     # (nbody, 4)
    xipos: jax.Array     # (nbody, 3) body COM
    xanchor: jax.Array   # (njnt, 3) joint anchors
    xaxis: jax.Array     # (njnt, 3) joint axes
    cdof: jax.Array      # (nv, 6) motion subspace [ang, lin] about tree origin
    tree_org: jax.Array  # (ntree, 3) per-tree spatial origin
    dof_org: jax.Array   # (nv, 3) tree origin per dof (gathered)
    body_org: jax.Array  # (nbody, 3) tree origin per body (world tree -> 0)


def fk(model: Model, qpos: jax.Array) -> Kin:
    """Single-scenario FK; `jax.vmap(lambda q: fk(m, q))` for batches.

    Runs at float32 matmul precision — the TPU default would lower the
    rotation/cdof einsums to bf16 and quantize world positions ~0.4%."""
    with jax.default_matmul_precision("float32"):
        return _fk_impl(model, qpos)


def _fk_impl(model: Model, qpos: jax.Array) -> Kin:
    t = model.topo
    f32 = qpos.dtype

    xpos = jnp.zeros((t.nbody, 3), f32)
    xquat = jnp.zeros((t.nbody, 4), f32).at[:, 0].set(1.0)
    # static bodies: poses precomputed at compile time
    static_mask = t.body_tree < 0
    if static_mask.any():
        ids = np.nonzero(static_mask)[0]
        xpos = xpos.at[ids].set(jnp.asarray(t.xpos0[ids], f32))
        xquat = xquat.at[ids].set(jnp.asarray(t.xquat0[ids], f32))

    xanchor = jnp.zeros((t.njnt, 3), f32)
    xaxis = jnp.zeros((t.njnt, 3), f32)

    for level in t.body_levels:
        pid = t.body_parent[level]
        p_pos, p_quat = xpos[pid], xquat[pid]
        pos = p_pos + quat_rotate(p_quat, model.body_pos[level])
        quat = quat_mul(p_quat, model.body_quat[level])
        # apply this level's joints slot-by-slot (ragged -> masked fixed slots)
        for k in range(int(t.body_jntnum[level].max()) if len(level) else 0):
            has = t.body_jntnum[level] > k
            jid = np.where(has, t.body_jntadr[level] + k, 0)
            jtype = t.jnt_type[jid]  # static numpy
            qadr = t.jnt_qposadr[jid]
            jpos = model.jnt_pos[jid]
            jaxis_l = model.jnt_axis[jid]
            ref = model.jnt_ref[jid]

            # world-frame anchor/axis at application time (out-of-range scatter
            # indices are dropped by XLA -> masked slots write nothing)
            jid_sc = np.where(has, jid, t.njnt)
            anchor_w = pos + quat_rotate(quat, jpos)
            axis_w = quat_rotate(quat, jaxis_l)
            xanchor = xanchor.at[jid_sc].set(anchor_w)
            xaxis = xaxis.at[jid_sc].set(axis_w)

            # per-type local joint transform (types are static -> select masks
            # are compile-time constants folded by XLA)
            th = qpos[qadr] - ref
            q_h = quat_from_axis_angle(jaxis_l, th)
            slide_p = jaxis_l * th[:, None]
            q_ball = quat_normalize(
                jnp.stack([qpos[qadr], qpos[qadr + 1], qpos[qadr + 2], qpos[qadr + 3]], -1)
            )
            tm = {}
            tm["quat"] = jnp.where(
                (jtype == JNT_HINGE)[:, None], q_h,
                jnp.where((jtype == JNT_BALL)[:, None], q_ball,
                          jnp.broadcast_to(jnp.array([1.0, 0, 0, 0], f32), q_h.shape)),
            )
            rot_jp = quat_rotate(tm["quat"], jpos)
            tm["pos"] = jnp.where(
                (jtype == JNT_SLIDE)[:, None], slide_p,
                jpos - rot_jp,
            )
            # free joints override the whole frame with qpos
            free_pos = jnp.stack([qpos[qadr], qpos[qadr + 1], qpos[qadr + 2]], -1)
            free_quat = quat_normalize(
                jnp.stack([qpos[qadr + 3], qpos[qadr + 4], qpos[qadr + 5], qpos[qadr + 6]], -1)
            )
            isfree = (jtype == JNT_FREE)[:, None]
            new_pos = jnp.where(isfree, free_pos, pos + quat_rotate(quat, tm["pos"]))
            new_quat = jnp.where(isfree, free_quat, quat_mul(quat, tm["quat"]))
            apply = has[:, None]
            pos = jnp.where(apply, new_pos, pos)
            quat = jnp.where(apply, new_quat, quat)
        xpos = xpos.at[level].set(pos)
        xquat = xquat.at[level].set(quat)

    # free joints: re-record anchor = body origin, after frame override
    free_j = np.nonzero(t.jnt_type == JNT_FREE)[0]
    if len(free_j):
        xanchor = xanchor.at[free_j].set(xpos[t.jnt_body[free_j]])

    xipos = xpos + quat_rotate(xquat, model.body_ipos)

    # per-tree origins = root body positions
    tree_org = xpos[t.tree_rootbody] if t.ntree else jnp.zeros((0, 3), f32)
    body_org = jnp.where(
        (t.body_tree >= 0)[:, None],
        tree_org[np.maximum(t.body_tree, 0)],
        jnp.zeros((1, 3), f32),
    )
    dof_org = tree_org[t.dof_tree] if t.nv else jnp.zeros((0, 3), f32)

    cdof = _compute_cdof(model, qpos, xquat, xanchor, xaxis, dof_org)
    return Kin(
        xpos=xpos, xquat=xquat, xipos=xipos, xanchor=xanchor, xaxis=xaxis,
        cdof=cdof, tree_org=tree_org, dof_org=dof_org, body_org=body_org,
    )


def _compute_cdof(model, qpos, xquat, xanchor, xaxis, dof_org):
    """Motion subspace per dof, world axes, about the dof's tree origin.

    hinge: [axis; (anchor-org) x axis]
    slide: [0; axis]
    ball:  3 columns [R e_i; (anchor-org) x (R e_i)] (qvel in child-body frame)
    free:  3 translational world columns + 3 rotational about the body origin,
           with angular velocity in the *body-local* frame (MuJoCo convention).
    """
    t = model.topo
    f32 = qpos.dtype
    if t.nv == 0:
        return jnp.zeros((0, 6), f32)
    cdof = jnp.zeros((t.nv, 6), f32)

    jt = t.jnt_type
    # hinges
    h = np.nonzero(jt == JNT_HINGE)[0]
    if len(h):
        d = t.jnt_dofadr[h]
        ax = xaxis[h]
        arm = xanchor[h] - dof_org[d]
        cdof = cdof.at[d].set(jnp.concatenate([ax, jnp.cross(arm, ax)], -1))
    # slides
    s = np.nonzero(jt == JNT_SLIDE)[0]
    if len(s):
        d = t.jnt_dofadr[s]
        cdof = cdof.at[d].set(jnp.concatenate([jnp.zeros_like(xaxis[s]), xaxis[s]], -1))
    # balls
    b = np.nonzero(jt == JNT_BALL)[0]
    if len(b):
        R = quat_to_mat(xquat[t.jnt_body[b]])  # (nb, 3, 3)
        for i in range(3):
            d = t.jnt_dofadr[b] + i
            ax = R[:, :, i]
            arm = xanchor[b] - dof_org[d]
            cdof = cdof.at[d].set(jnp.concatenate([ax, jnp.cross(arm, ax)], -1))
    # free joints
    fj = np.nonzero(jt == JNT_FREE)[0]
    if len(fj):
        bid = t.jnt_body[fj]
        R = quat_to_mat(xquat[bid])
        eye = jnp.eye(3, dtype=f32)
        for i in range(3):
            d = t.jnt_dofadr[fj] + i
            col = jnp.broadcast_to(eye[i], (len(fj), 3))
            cdof = cdof.at[d].set(jnp.concatenate([jnp.zeros_like(col), col], -1))
        for i in range(3):
            d = t.jnt_dofadr[fj] + 3 + i
            ax = R[:, :, i]
            arm = xanchor[fj] - dof_org[d]
            cdof = cdof.at[d].set(jnp.concatenate([ax, jnp.cross(arm, ax)], -1))
    return cdof


def geom_poses(model: Model, kin: Kin):
    """World poses of all geoms: (ngeom,3) positions, (ngeom,4) quats."""
    t = model.topo
    bp = kin.xpos[t.geom_body]
    bq = kin.xquat[t.geom_body]
    return bp + quat_rotate(bq, model.geom_pos), quat_mul(bq, model.geom_quat)


def site_velocity(kin: Kin, qvel: jax.Array, body_id: int, point_w: jax.Array,
                  dof_ids: np.ndarray):
    """Linear velocity of a world point on a body (via cdof columns)."""
    cd = kin.cdof[dof_ids]
    ang = cd[:, :3]
    lin = cd[:, 3:] + jnp.cross(ang, point_w - kin.dof_org[dof_ids])
    return (lin * qvel[dof_ids, None]).sum(0)
