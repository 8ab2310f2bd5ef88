"""Batched damped-Gauss-Newton IK over the compiled kinematic chain.

Replaces the reference's ikpy/scipy least-squares solve
(/root/reference/gym_grasper/controller/MujocoController.py:467-517):
position target for the ee_link body plus the vertical-gripper constraint
(ee_link local X axis aligned to world [0,0,-1], ikpy ``orientation_mode="X"``
with target ``[0,0,-1]``), solved for the 5 arm joints
[shoulder_pan, shoulder_lift, elbow, wrist_1, wrist_2] — wrist_3 is excluded
exactly like the reference's ``joint_angles[1:-2]`` trim (:509).

Branch parity: the reference URDF bounds shoulder_lift to [-pi, -0.9]
(ur5_gripper.urdf), which pins the elbow-up solution family; we enforce the
same bounds by clamping each Gauss-Newton update, and start from the home
pose (inside that family). The reference's 0.02 m FK round-trip gate (:510)
is returned as a success mask rather than a None.

Everything is a fixed-iteration `lax.scan` of 5x5 solves — one scenario is a
few thousand FLOPs, so 4096 IK solves batch trivially with `vmap`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_rl_ur5_tpu.ops.spatial import quat_mul, quat_rotate, quat_to_mat
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_HINGE
from mujoco_rl_ur5_tpu.scene.model import Model

# gripper-center offset: chain-tip target = world target + OFFSET
# (MujocoController.py:493 adds it in base coordinates; the base frame is
# world-axis-aligned so the offset is a world vector)
EE_OFFSET = np.array([0.0, -0.005, 0.16])
# URDF joint bounds (ur5_gripper.urdf): +-pi, except shoulder_lift
ARM_LO = np.array([-np.pi, -np.pi, -np.pi, -np.pi, -np.pi])
ARM_HI = np.array([np.pi, -0.9, np.pi, np.pi, np.pi])


class ArmChain:
    """Static arm-chain description extracted from the compiled Topology.

    ``bodies``: path world->tip (moving bodies only), ``jnt``: joint id on
    each path body (-1 = fixed), ``solve_slot``: position of each solved
    joint within the path.
    """

    def __init__(self, model: Model, tip_body: str = "ee_link",
                 solve_joints=("shoulder_pan_joint", "shoulder_lift_joint",
                               "elbow_joint", "wrist_1_joint", "wrist_2_joint")):
        t = model.topo
        tip = t.body_id(tip_body)
        path = []
        b = tip
        while b != 0:
            path.append(b)
            b = int(t.body_parent[b])
        self.bodies = np.array(path[::-1], np.int32)
        jnt = []
        for b in self.bodies:
            if t.body_jntnum[b] > 0:
                j = int(t.body_jntadr[b])
                assert t.jnt_type[j] == JNT_HINGE, "IK chain supports hinges only"
                assert t.body_jntnum[b] == 1
                jnt.append(j)
            else:
                jnt.append(-1)
        self.jnt = np.array(jnt, np.int32)
        solve_ids = [t.joint_id(n) for n in solve_joints]
        self.solve_jnt = np.array(solve_ids, np.int32)
        self.qadr = t.jnt_qposadr[self.jnt.clip(0)]          # (npath,)
        self.solve_mask = np.isin(self.jnt, solve_ids)       # (npath,)
        # map path position -> output slot (order of solve_joints)
        self.out_slot = np.array(
            [solve_ids.index(j) if j in solve_ids else -1 for j in self.jnt],
            np.int32,
        )
        self.n_solve = len(solve_ids)


def _chain_fk(model: Model, chain: ArmChain, q_solve: jax.Array, qpos_rest: jax.Array):
    """FK along the chain. q_solve: (n_solve,) solved angles; qpos_rest: full
    qpos supplying values for non-solved chain joints (e.g. wrist_3).
    Returns (tip_pos, tip_quat) and per-joint (anchor, axis) for Jacobians."""
    t = model.topo
    f32 = q_solve.dtype
    pos = jnp.zeros(3, f32)
    quat = jnp.array([1.0, 0, 0, 0], f32)
    anchors, axes = [], []
    for k, b in enumerate(chain.bodies):
        pos = pos + quat_rotate(quat, model.body_pos[b])
        quat = quat_mul(quat, model.body_quat[b])
        j = chain.jnt[k]
        if j >= 0:
            theta = (q_solve[chain.out_slot[k]] if chain.solve_mask[k]
                     else qpos_rest[chain.qadr[k]]) - model.jnt_ref[j]
            ax_l = model.jnt_axis[j]
            anchor_w = pos + quat_rotate(quat, model.jnt_pos[j])
            half = 0.5 * theta
            qj = jnp.concatenate([jnp.cos(half)[None], jnp.sin(half) * ax_l])
            # rotate about anchor: p' = anchor + R_j (p - anchor) applied in body frame
            jpos = model.jnt_pos[j]
            tm_pos = jpos - quat_rotate(qj, jpos)
            pos = pos + quat_rotate(quat, tm_pos)
            quat = quat_mul(quat, qj)
            axis_w = quat_rotate(quat, ax_l)
            if chain.solve_mask[k]:
                anchors.append(anchor_w)
                axes.append(axis_w)
    return pos, quat, jnp.stack(anchors), jnp.stack(axes)


def ik_solve(model: Model, chain: ArmChain, target: jax.Array, qpos: jax.Array,
             iterations: int = 30, damping: float = 1e-3,
             ori_weight: float = 0.5, down=(0.0, 0.0, -1.0),
             max_step: float = 0.5):
    """Solve arm IK for a world grasp-center target (vertical gripper).

    Multi-start projected damped Gauss-Newton: plain GN from the home pose
    diverges on half the pick-bin workspace (clamped updates at the
    shoulder_lift bound oscillate), so four seeds run in parallel — the home
    pose plus azimuth-informed ones (the elbow-up vertical-grasp family
    satisfies shoulder_pan ~ atan2(ty, tx), verified against scipy
    least-squares on MuJoCo FK over the bin workspace) — and the best
    round-trip error wins. Per-iteration steps are norm-clamped to
    ``max_step`` rad to keep the clamped iteration contractive.

    Returns (q5, err, ok): the 5 joint angles, the FK round-trip position
    error, and the reference's ``error <= 0.02`` acceptance gate
    (MujocoController.py:510). vmap over leading axes of ``target``/``qpos``
    for batched solves.
    """
    f32 = target.dtype
    tip_target = target + jnp.asarray(EE_OFFSET, f32)
    downv = jnp.asarray(down, f32)
    lo = jnp.asarray(ARM_LO, f32)
    hi = jnp.asarray(ARM_HI, f32)
    azim = jnp.arctan2(target[1], target[0])
    rest = jnp.asarray([-1.29, 1.36, -1.64, -1.57], f32)
    # far-reach family: shoulder_lift pinned at its URDF bound (-0.9)
    rest_far = jnp.asarray([-0.9, 1.15, -1.82, -1.57], f32)
    home = jnp.asarray([0.0, -1.57, 1.57, -1.57, -1.57], f32)
    seeds = jnp.stack([
        home,
        jnp.concatenate([azim[None], rest]),
        jnp.concatenate([azim[None] + 0.25, rest]),
        jnp.concatenate([azim[None] - 0.25, rest]),
        jnp.concatenate([azim[None], rest_far]),
        jnp.concatenate([azim[None] + 0.2, rest_far]),
    ])

    def residual(q):
        pos, quat, anchors, axes = _chain_fk(model, chain, q, qpos)
        R = quat_to_mat(quat)
        r_pos = pos - tip_target
        r_ori = ori_weight * (R[:, 0] - downv)
        return r_pos, r_ori, pos, anchors, axes, R

    def step(q, _):
        r_pos, r_ori, pos, anchors, axes, R = residual(q)
        # position rows: dp/dq_i = axis_i x (tip - anchor_i)
        Jp = jnp.cross(axes, pos[None] - anchors)            # (5, 3)
        # orientation rows: d(R ex)/dq_i = axis_i x (R ex)
        Jo = ori_weight * jnp.cross(axes, R[:, 0][None])     # (5, 3)
        J = jnp.concatenate([Jp, Jo], axis=1).T              # (6, 5)
        r = jnp.concatenate([r_pos, r_ori])
        H = J.T @ J + damping * jnp.eye(chain.n_solve, dtype=f32)
        dq = jnp.linalg.solve(H, J.T @ r)
        scale = jnp.minimum(1.0, max_step / jnp.maximum(jnp.linalg.norm(dq), 1e-9))
        q = jnp.clip(q - dq * scale, lo, hi)
        return q, None

    def solve_one(q0):
        q, _ = jax.lax.scan(step, q0, None, length=iterations)
        r_pos, _, _, _, _, _ = residual(q)
        return q, jnp.linalg.norm(r_pos)

    qs, errs = jax.vmap(solve_one)(seeds)
    best = jnp.argmin(errs)
    q, err = qs[best], errs[best]
    return q, err, err <= 0.02
