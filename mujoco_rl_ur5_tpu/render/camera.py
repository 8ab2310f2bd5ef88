"""Pinhole camera model with the reference's exact conventions.

The reference reconstructs intrinsics itself from the MJCF camera
(fovy/cam_pos0/cam_mat0, MujocoController.py:742-759):

    f          = 0.5 * height / tan(fovy * pi / 360)
    cam_matrix = [[f, 0, W/2], [0, f, H/2], [0, 0, 1]]

and its pixel<->world transforms (MujocoController.py:761-806) multiply
``cam_matrix @ cam_rot_mat @ (world - cam_pos)`` where ``cam_rot_mat`` is
mjModel.cam_mat0 used *untransposed*, and invert with
``inv(R) @ (pos_c + cam_pos)``. Both quirks are identity-safe for the policy
camera (``top_down`` has identity orientation, axisangle="2 2 2 0",
UR5gripper_2_finger_many_objects.xml:114) and are reproduced verbatim so
pixel coordinates and the action decoding agree bit-for-bit.

Depth parity: MuJoCo's GL buffer stores d in [0, 1] with
``meters = near / (1 - d (1 - near/far))`` (depth_2_meters,
MujocoController.py:729-740) where near/far = vis.map.{znear,zfar} * extent.
The renderer produces planar eye depth (distance along the -Z camera axis)
and encodes it with the inverse so depth_2_meters round-trips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from mujoco_rl_ur5_tpu.scene.model import Model


@struct.dataclass
class Camera:
    """Static camera bound to (model, width, height)."""

    pos: jax.Array        # (3,) world position (cam_pos0)
    rot: jax.Array        # (3, 3) cam_mat0 (columns = camera axes in world)
    K: jax.Array          # (3, 3) intrinsics
    width: int = struct.field(pytree_node=False, default=200)
    height: int = struct.field(pytree_node=False, default=200)
    near: float = struct.field(pytree_node=False, default=0.01)
    far: float = struct.field(pytree_node=False, default=50.0)


def _quat_mat(q):
    w, x, y, z = q
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def make_camera(model: Model, camera: str = "top_down", width: int = 200,
                height: int = 200) -> Camera:
    t = model.topo
    cid = t.cam_id(camera)
    fovy = float(model.cam_fovy[cid])
    f = 0.5 * height / np.tan(fovy * np.pi / 360.0)
    K = jnp.asarray(
        [[f, 0.0, width / 2.0], [0.0, f, height / 2.0], [0.0, 0.0, 1.0]],
        model.cam_pos.dtype,
    )
    rot = _quat_mat(model.cam_quat[cid])
    return Camera(
        pos=model.cam_pos[cid], rot=rot, K=K, width=width, height=height,
        near=t.znear * t.extent, far=t.zfar * t.extent,
    )


def world_2_pixel(cam: Camera, world: jax.Array):
    """World XYZ -> (px, py), the reference's testing helper
    (MujocoController.py:761-781, incl. the untransposed cam_mat0)."""
    hom = cam.K @ (cam.rot @ (world - cam.pos))
    pix = hom[:2] / hom[2]
    return jnp.round(pix[0]).astype(jnp.int32), jnp.round(pix[1]).astype(jnp.int32)


def pixel_2_world(cam: Camera, px, py, depth):
    """Pixel + metric depth -> world XYZ (MujocoController.py:783-806)."""
    pixel_coord = jnp.stack([px, py, jnp.ones_like(px)]).astype(depth.dtype) * (-depth)
    pos_c = jnp.linalg.inv(cam.K) @ pixel_coord
    return jnp.linalg.inv(cam.rot) @ (pos_c + cam.pos)


def camera_rays(cam: Camera):
    """Per-pixel world-frame ray directions (unnormalized, z_cam = -1 plane).

    MuJoCo cameras look along their local -Z; a pixel (px, py) back-projects
    through K^-1 with z_cam = -depth (see pixel_2_world). The renderer casts
    r(s) = pos + s * dir with dir = R^T @ K^-1 [px, py, 1] * (-1), so planar
    eye depth equals the ray parameter s.

    Returns dirs (H, W, 3) for pixel grid [py, px].
    """
    px = jnp.arange(cam.width, dtype=cam.K.dtype)
    py = jnp.arange(cam.height, dtype=cam.K.dtype)
    PX, PY = jnp.meshgrid(px, py)                     # (H, W)
    ones = jnp.ones_like(PX)
    pix = jnp.stack([PX, PY, ones], axis=-1)          # (H, W, 3)
    Kinv = jnp.linalg.inv(cam.K)
    dirs_cam = -(pix @ Kinv.T)                        # z_cam = -1
    # camera-to-world: columns of cam.rot are camera axes in world
    return dirs_cam @ cam.rot.T


def encode_depth(cam: Camera, meters: jax.Array) -> jax.Array:
    """Metric eye depth -> GL depth-buffer value (inverse of depth_2_meters)."""
    return (1.0 - cam.near / meters) / (1.0 - cam.near / cam.far)


def depth_2_meters(cam: Camera, d: jax.Array) -> jax.Array:
    """GL depth-buffer value -> meters (MujocoController.py:729-740)."""
    return cam.near / (1.0 - d * (1.0 - cam.near / cam.far))
