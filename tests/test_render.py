"""Render-layer parity: ray-cast depth vs mujoco.mj_ray, GL depth-buffer
encoding round-trip, and pixel<->world transforms (the reference implemented
world_2_pixel explicitly "for testing the correctness of the camera matrix",
MujocoController.py:761-781)."""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.physics.kinematics import fk
from mujoco_rl_ur5_tpu.render import make_camera, pixel_2_world, world_2_pixel
from mujoco_rl_ur5_tpu.render.camera import camera_rays, depth_2_meters
from mujoco_rl_ur5_tpu.render.raycast import render_rgbd
from mujoco_rl_ur5_tpu.scene import load_model
from tests.conftest import ref_scene

SCENE = "UR5gripper_2_finger_many_objects.xml"
HOME = np.array([0, -1.57, 1.57, -1.57, -1.57, 0, 0.3, 0.3])


@pytest.fixture(scope="module")
def model():
    return load_model(ref_scene(SCENE))


@pytest.fixture(scope="module")
def mj():
    return mujoco.MjModel.from_xml_path(ref_scene(SCENE))


def _scatter_qpos(model, seed=3):
    """Home arm + objects scattered over the pick bin."""
    t = model.topo
    rng = np.random.RandomState(seed)
    qpos = np.asarray(model.qpos0).copy()
    qpos[:8] = HOME
    for j in range(t.njnt):
        if t.jnt_type[j] == 0:
            qa = t.jnt_qposadr[j]
            qpos[qa:qa + 3] = [rng.uniform(-0.2, 0.2), rng.uniform(-0.75, -0.45),
                               rng.uniform(0.9, 0.95)]
            q = rng.randn(4)
            qpos[qa + 3:qa + 7] = q / np.linalg.norm(q)
    return qpos


def test_depth_vs_mujoco_rays(model, mj):
    """Planar depth from the renderer matches mujoco.mj_ray geometry for the
    top_down camera over a grid of pixels (tolerance: mesh geoms are cast
    against their convex hulls, so compare only pixels whose mujoco hit is a
    non-mesh geom)."""
    qpos = _scatter_qpos(model)
    dd = mujoco.MjData(mj)
    dd.qpos[:] = qpos
    mujoco.mj_forward(mj, dd)

    cam = make_camera(model, "top_down", 200, 200)
    kin = fk(model, jnp.asarray(qpos, jnp.float32))
    rgb, dbuf = jax.jit(lambda k: render_rgbd(model, k, cam))(kin)
    meters = np.asarray(depth_2_meters(cam, dbuf))

    dirs = np.asarray(camera_rays(cam))
    dirs = dirs / np.linalg.norm(dirs, axis=-1, keepdims=True)
    fwd = -np.asarray(cam.rot)[:, 2]
    geomid = np.zeros(1, np.int32)
    n_checked = 0
    for py in range(10, 200, 25):
        for px in range(10, 200, 25):
            d = dirs[py, px]
            dist = mujoco.mj_ray(mj, dd, np.asarray(cam.pos, np.float64),
                                 d.astype(np.float64), None, 1, -1, geomid)
            if dist < 0 or geomid[0] < 0:
                continue
            if mj.geom_type[geomid[0]] == mujoco.mjtGeom.mjGEOM_MESH:
                continue
            z_mj = dist * float(d @ fwd)
            # images are flipped [::-1, ::-1]
            z_mine = meters[199 - py, 199 - px]
            assert abs(z_mj - z_mine) < 5e-3, (px, py, z_mj, z_mine)
            n_checked += 1
    assert n_checked > 20


def test_depth_encoding_roundtrip(model):
    cam = make_camera(model, "top_down", 200, 200)
    from mujoco_rl_ur5_tpu.render.camera import encode_depth

    # rtol bounded by f32 cancellation in (1 - near/z) at z >> near; the
    # policy's working range is 1-2 m where the error is far smaller
    z = jnp.linspace(cam.near * 1.01, cam.far * 0.99, 50)
    z2 = depth_2_meters(cam, encode_depth(cam, z))
    assert np.allclose(np.asarray(z), np.asarray(z2), rtol=2e-3)
    zw = jnp.linspace(0.8, 2.5, 20)
    zw2 = depth_2_meters(cam, encode_depth(cam, zw))
    assert np.allclose(np.asarray(zw), np.asarray(zw2), rtol=1e-4)


def test_pixel_world_roundtrip(model):
    """pixel_2_world(world_2_pixel(w), depth) recovers w for the top_down
    camera (identity orientation; the reference quirks are identity-safe)."""
    cam = make_camera(model, "top_down", 200, 200)
    pts = np.array([
        [0.0, -0.6, 1.1], [0.1, -0.5, 0.95], [-0.2, -0.7, 0.9],
        [0.15, -0.45, 1.0],
    ])
    for w in pts:
        px, py = world_2_pixel(cam, jnp.asarray(w, jnp.float32))
        depth = float(np.asarray(cam.pos)[2] - w[2])
        back = np.asarray(pixel_2_world(cam, jnp.asarray(px, jnp.float32),
                                        jnp.asarray(py, jnp.float32),
                                        jnp.asarray(depth, jnp.float32)))
        assert np.linalg.norm(back - w) < 0.01, (w, back)


def test_cam_fovy_intrinsics(model, mj):
    """Focal length matches the reference formula on mujoco's fovy."""
    cid = mujoco.mj_name2id(mj, mujoco.mjtObj.mjOBJ_CAMERA, "top_down")
    f_ref = 0.5 * 200 / np.tan(mj.cam_fovy[cid] * np.pi / 360)
    cam = make_camera(model, "top_down", 200, 200)
    assert abs(float(cam.K[0, 0]) - f_ref) < 1e-3
