"""Quaternion / rotation / spatial(6D) algebra for batched rigid-body dynamics.

Conventions (MuJoCo-compatible, so compiled models agree numerically with the
engine the reference drives through mujoco_py — see
/root/reference/gym_grasper/controller/MujocoController.py:8):

  * quaternions are (w, x, y, z), unit norm, Hamilton convention
  * rotation matrices are world-from-local (R @ v_local = v_world)
  * spatial motion vectors are 6D ``[angular(3), linear(3)]``
  * spatial inertias are expressed as the 10-parameter form
    (mass, first moment h = m*c, 3x3 rotational inertia about the frame origin)

Everything here is shape-polymorphic pure jnp so it vmaps/jits freely; the
hot consumers (CRBA / RNE / integrator) batch these over (B, nbody) without
reshapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# ---------------------------------------------------------------------------
# Quaternions
# ---------------------------------------------------------------------------


def quat_mul(u: jax.Array, v: jax.Array) -> jax.Array:
    """Hamilton product u*v for (...,4) quats."""
    uw, ux, uy, uz = u[..., 0], u[..., 1], u[..., 2], u[..., 3]
    vw, vx, vy, vz = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    return jnp.stack(
        [
            uw * vw - ux * vx - uy * vy - uz * vz,
            uw * vx + ux * vw + uy * vz - uz * vy,
            uw * vy - ux * vz + uy * vw + uz * vx,
            uw * vz + ux * vy - uy * vx + uz * vw,
        ],
        axis=-1,
    )


def quat_conj(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vector(s) v (...,3) by quat(s) q (...,4): R(q) @ v."""
    w = q[..., :1]
    u = q[..., 1:]
    uv = jnp.cross(u, v)
    return v + 2.0 * (w * uv + jnp.cross(u, uv))


def quat_rotate_inv(q: jax.Array, v: jax.Array) -> jax.Array:
    """R(q)^T @ v."""
    return quat_rotate(quat_conj(q), v)


def quat_to_mat(q: jax.Array) -> jax.Array:
    """(...,4) -> (...,3,3) rotation matrix, world-from-local."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return r.reshape(q.shape[:-1] + (3, 3))


def mat_to_quat(m: jax.Array) -> jax.Array:
    """(...,3,3) -> (...,4), branch-free Shepperd via stacked candidates."""
    tr = m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2]

    def cand(w2_expr, vec):
        s = jnp.sqrt(jnp.maximum(w2_expr, 1e-18)) * 2.0
        return jnp.stack(vec(s), axis=-1)

    m00, m11, m22 = m[..., 0, 0], m[..., 1, 1], m[..., 2, 2]
    q0 = cand(1.0 + tr, lambda s: (0.25 * s,
                                   (m[..., 2, 1] - m[..., 1, 2]) / s,
                                   (m[..., 0, 2] - m[..., 2, 0]) / s,
                                   (m[..., 1, 0] - m[..., 0, 1]) / s))
    q1 = cand(1.0 + m00 - m11 - m22, lambda s: ((m[..., 2, 1] - m[..., 1, 2]) / s,
                                                0.25 * s,
                                                (m[..., 0, 1] + m[..., 1, 0]) / s,
                                                (m[..., 0, 2] + m[..., 2, 0]) / s))
    q2 = cand(1.0 - m00 + m11 - m22, lambda s: ((m[..., 0, 2] - m[..., 2, 0]) / s,
                                                (m[..., 0, 1] + m[..., 1, 0]) / s,
                                                0.25 * s,
                                                (m[..., 1, 2] + m[..., 2, 1]) / s))
    q3 = cand(1.0 - m00 - m11 + m22, lambda s: ((m[..., 1, 0] - m[..., 0, 1]) / s,
                                                (m[..., 0, 2] + m[..., 2, 0]) / s,
                                                (m[..., 1, 2] + m[..., 2, 1]) / s,
                                                0.25 * s))
    # pick the numerically best branch
    scores = jnp.stack([tr, m00, m11, m22], axis=-1)
    idx = jnp.argmax(scores, axis=-1)
    qs = jnp.stack([q0, q1, q2, q3], axis=-2)  # (...,4cand,4)
    q = jnp.take_along_axis(qs, idx[..., None, None].astype(jnp.int32), axis=-2)[..., 0, :]
    return quat_normalize(q)


def quat_from_axis_angle(axis: jax.Array, angle: jax.Array) -> jax.Array:
    """Unit axis (...,3), angle (...,) -> quat (...,4)."""
    half = angle * 0.5
    s = jnp.sin(half)
    return jnp.concatenate([jnp.cos(half)[..., None], axis * s[..., None]], axis=-1)


def quat_integrate(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate quat by angular velocity omega (local frame), MuJoCo mju_quatIntegrate.

    MuJoCo stores free/ball joint angular velocity in the *body-local* frame and
    integrates q' = q * exp(dt/2 * omega_local).
    """
    angle = jnp.linalg.norm(omega, axis=-1)
    axis = omega / jnp.maximum(angle, 1e-12)[..., None]
    dq = quat_from_axis_angle(axis, angle * dt)
    return quat_normalize(quat_mul(q, dq))


def quat_sub(qa: jax.Array, qb: jax.Array) -> jax.Array:
    """Velocity-space difference: 3D rotation vector v with qa = qb * exp(v/2).

    Matches MuJoCo mj_differentiatePos semantics for ball/free quats (local frame).
    """
    dq = quat_mul(quat_conj(qb), qa)
    dq = jnp.where(dq[..., :1] < 0, -dq, dq)  # shortest arc
    sin_half = jnp.linalg.norm(dq[..., 1:], axis=-1)
    cos_half = dq[..., 0]
    angle = 2.0 * jnp.arctan2(sin_half, cos_half)
    axis = dq[..., 1:] / jnp.maximum(sin_half, 1e-12)[..., None]
    return axis * angle[..., None]


def random_quat(key: jax.Array, shape=()) -> jax.Array:
    """Uniform random unit quaternion(s), parity with pyquaternion.Quaternion.random()
    used in reset randomization (/root/reference/gym_grasper/envs/GraspingEnv.py:427)."""
    u = jax.random.uniform(key, shape + (3,))
    u1, u2, u3 = u[..., 0], u[..., 1], u[..., 2]
    a, b = jnp.sqrt(1.0 - u1), jnp.sqrt(u1)
    return jnp.stack(
        [a * jnp.sin(2 * jnp.pi * u2), a * jnp.cos(2 * jnp.pi * u2),
         b * jnp.sin(2 * jnp.pi * u3), b * jnp.cos(2 * jnp.pi * u3)],
        axis=-1,
    )


# ---------------------------------------------------------------------------
# Spatial (6D) algebra — MuJoCo layout [angular, linear]
# ---------------------------------------------------------------------------


def motion_cross(v: jax.Array, m: jax.Array) -> jax.Array:
    """Spatial motion cross product v x m for (...,6) motion vectors."""
    vw, vl = v[..., :3], v[..., 3:]
    mw, ml = m[..., :3], m[..., 3:]
    return jnp.concatenate(
        [jnp.cross(vw, mw), jnp.cross(vw, ml) + jnp.cross(vl, mw)], axis=-1
    )


def force_cross(v: jax.Array, f: jax.Array) -> jax.Array:
    """Spatial force cross product v x* f for (...,6) force vectors."""
    vw, vl = v[..., :3], v[..., 3:]
    fw, fl = f[..., :3], f[..., 3:]
    return jnp.concatenate(
        [jnp.cross(vw, fw) + jnp.cross(vl, fl), jnp.cross(vw, fl)], axis=-1
    )


def inertia_mul(inert: jax.Array, v: jax.Array) -> jax.Array:
    """Apply 10-parameter spatial inertia to a motion vector -> force vector.

    ``inert`` is (...,10): [mass, hx, hy, hz, Ixx, Iyy, Izz, Ixy, Ixz, Iyz]
    (inertia about the reference-frame origin, h = m * com_offset).
    Force = [I w + h x v_lin ; m v_lin - h x w]  (MuJoCo mju_mulInertVec).
    """
    mass = inert[..., 0:1]
    h = inert[..., 1:4]
    ixx, iyy, izz = inert[..., 4], inert[..., 5], inert[..., 6]
    ixy, ixz, iyz = inert[..., 7], inert[..., 8], inert[..., 9]
    w, vl = v[..., :3], v[..., 3:]
    iw = jnp.stack(
        [
            ixx * w[..., 0] + ixy * w[..., 1] + ixz * w[..., 2],
            ixy * w[..., 0] + iyy * w[..., 1] + iyz * w[..., 2],
            ixz * w[..., 0] + iyz * w[..., 1] + izz * w[..., 2],
        ],
        axis=-1,
    )
    return jnp.concatenate(
        [iw + jnp.cross(h, vl), mass * vl - jnp.cross(h, w)], axis=-1
    )


def inertia_from_body(mass, diag_inertia, ipos, iquat) -> jax.Array:
    """Build the 10-parameter world/common-frame spatial inertia of a body whose
    COM sits at ``ipos`` (frame-relative) with principal inertia ``diag_inertia``
    oriented by ``iquat``.

    Parallel-axis: I_origin = R diag(I) R^T + m (c.c 1 - c c^T);  h = m c.
    Returns (...,10) in the layout consumed by :func:`inertia_mul`.
    """
    r = quat_to_mat(iquat)
    i_com = r * diag_inertia[..., None, :] @ jnp.swapaxes(r, -1, -2)
    c = ipos
    cc = jnp.einsum("...i,...j->...ij", c, c)
    c2 = jnp.sum(c * c, axis=-1)[..., None, None]
    eye = jnp.eye(3, dtype=mass.dtype)
    i_org = i_com + mass[..., None, None] * (c2 * eye - cc)
    h = mass[..., None] * c
    return jnp.concatenate(
        [
            mass[..., None],
            h,
            i_org[..., 0, 0, None], i_org[..., 1, 1, None], i_org[..., 2, 2, None],
            i_org[..., 0, 1, None], i_org[..., 0, 2, None], i_org[..., 1, 2, None],
        ],
        axis=-1,
    )


def inertia_shift(inert: jax.Array, offset: jax.Array) -> jax.Array:
    """Re-express a 10-parameter spatial inertia about a new origin shifted by
    ``offset`` (new_origin = old_origin + offset, same orientation)."""
    mass = inert[..., 0]
    h = inert[..., 1:4]
    # c_old = h/m relative to old origin; new first moment h' = h - m*offset
    hp = h - mass[..., None] * offset
    # I' = I - m*(d.d 1 - d d^T) ... careful: standard parallel axis both ways.
    # I_origin = I_com + m*(c.c 1 - c c^T). So:
    # I_new = I_old - m*(c.c 1 - c c^T) + m*(c'.c' 1 - c' c'^T), c' = c - offset
    c = h / jnp.maximum(mass[..., None], 1e-12)
    cp = c - offset
    def outer_term(x):
        xx = jnp.einsum("...i,...j->...ij", x, x)
        x2 = jnp.sum(x * x, axis=-1)[..., None, None]
        return x2 * jnp.eye(3, dtype=inert.dtype) - xx
    i_old = jnp.zeros(inert.shape[:-1] + (3, 3), inert.dtype)
    i_old = i_old.at[..., 0, 0].set(inert[..., 4]).at[..., 1, 1].set(inert[..., 5]).at[..., 2, 2].set(inert[..., 6])
    i_old = i_old.at[..., 0, 1].set(inert[..., 7]).at[..., 1, 0].set(inert[..., 7])
    i_old = i_old.at[..., 0, 2].set(inert[..., 8]).at[..., 2, 0].set(inert[..., 8])
    i_old = i_old.at[..., 1, 2].set(inert[..., 9]).at[..., 2, 1].set(inert[..., 9])
    i_new = i_old - mass[..., None, None] * (outer_term(c) - outer_term(cp))
    return jnp.concatenate(
        [
            mass[..., None], hp,
            i_new[..., 0, 0, None], i_new[..., 1, 1, None], i_new[..., 2, 2, None],
            i_new[..., 0, 1, None], i_new[..., 0, 2, None], i_new[..., 1, 2, None],
        ],
        axis=-1,
    )


def transform_motion(v: jax.Array, pos: jax.Array, rot_flat=None) -> jax.Array:
    """Translate a world-frame motion vector's reference point by ``pos``
    (new_point = old_point + pos): w' = w, v' = v - w x pos ... (sign per MuJoCo
    mju_transformSpatial with rotation = identity)."""
    w, vl = v[..., :3], v[..., 3:]
    return jnp.concatenate([w, vl - jnp.cross(w, pos)], axis=-1)
