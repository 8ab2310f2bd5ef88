"""Pallas raycast kernel parity: the fused min-cast kernel
(render/pallas_raycast.py, run in interpreter mode on the CPU test mesh)
must agree with the pure-jnp reference path (raycast._cast_all) on hit
distances, winning geoms, and world normals for the full grasp scene."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import ref_scene

from mujoco_rl_ur5_tpu.physics.kinematics import fk
from mujoco_rl_ur5_tpu.render import make_camera
from mujoco_rl_ur5_tpu.render.camera import camera_rays
from mujoco_rl_ur5_tpu.render.pallas_raycast import BIG, cast_rays
from mujoco_rl_ur5_tpu.render.raycast import _cast_all, render_rgbd
from mujoco_rl_ur5_tpu.scene import load_model, make_state


@pytest.fixture(scope="module")
def scene():
    model = load_model(ref_scene("UR5gripper_2_finger_many_objects.xml"))
    state = make_state(model)
    # drop a few objects to bin height so spheres/boxes/cyls are visible
    t = model.topo
    from mujoco_rl_ur5_tpu.scene.mjcf import JNT_FREE

    free = np.nonzero(t.jnt_type == JNT_FREE)[0]
    qa = t.jnt_qposadr[free]
    qpos = np.array(state.qpos)
    rng = np.random.default_rng(0)
    qpos[qa] = rng.uniform(-0.2, 0.2, len(free))
    qpos[qa + 1] = rng.uniform(-0.7, -0.5, len(free))
    qpos[qa + 2] = 0.95
    state = state.replace(qpos=jnp.asarray(qpos))
    kin = fk(model, state.qpos)
    cam = make_camera(model, "top_down", 40, 40)
    return model, kin, cam


def test_pallas_cast_matches_jnp(scene):
    model, kin, cam = scene
    dirs = camera_rays(cam).reshape(-1, 3)
    dn = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)

    s_ref, n_ref = _cast_all(model, kin, cam.pos, dn)
    alpha = model.geom_rgba[:, 3]
    s_ref = jnp.where((alpha > 0.01)[None, :], s_ref, BIG)
    g_ref = np.asarray(jnp.argmin(s_ref, axis=1))
    smin_ref = np.asarray(jnp.min(s_ref, axis=1))
    nrm_ref = np.asarray(jnp.take_along_axis(
        n_ref, jnp.asarray(g_ref)[:, None, None].repeat(3, -1), 1)[:, 0])

    s_k, g_k, n_k = jax.jit(
        lambda k: cast_rays(model, k, cam.pos, dn, interpret=True))(kin)
    s_k, g_k, n_k = np.asarray(s_k), np.asarray(g_k), np.asarray(n_k)

    hit = smin_ref < BIG / 2
    assert hit.mean() > 0.9, "camera should see the scene"
    np.testing.assert_allclose(s_k[hit], smin_ref[hit], rtol=1e-4, atol=1e-5)
    assert (~hit | (s_k < BIG / 2)).all()
    # winning geom can differ only where two surfaces are within tolerance
    diff = g_k != g_ref
    if diff.any():
        assert (np.abs(s_k[diff] - smin_ref[diff]) < 1e-3).all()
    same = hit & ~diff
    # curved-surface normals amplify the f32 ulps of s (n = p - axis_point),
    # observed max ~6e-4 — fine for the Lambertian shading they feed
    np.testing.assert_allclose(n_k[same], nrm_ref[same], atol=2e-3)


def test_pallas_render_path_matches_jnp(scene):
    """Full render through both paths: identical depth buffers, near-identical
    RGB (shading uses the same normals)."""
    model, kin, cam = scene
    rgb_j, dbuf_j = jax.jit(
        lambda k: render_rgbd(model, k, cam, use_pallas=False))(kin)
    # interpret-mode pallas inside jit: patch through cast_rays directly
    from mujoco_rl_ur5_tpu.render import raycast as rc

    def pallas_render(k):
        import mujoco_rl_ur5_tpu.render.pallas_raycast as pr

        # render_rgbd(use_pallas=True) calls cast_rays without interpret;
        # emulate it here with interpret=True for the CPU test platform
        dirs = rc.camera_rays(cam).reshape(-1, 3)
        dn = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
        s_star, g_star, nrm = pr.cast_rays(model, k, cam.pos, dn,
                                           interpret=True)
        fwd = -cam.rot[:, 2]
        zdepth = jnp.clip(s_star * (dn @ fwd), cam.near, cam.far)
        dbuf = rc.encode_depth(cam, zdepth)
        lambert = jnp.abs(nrm @ fwd)
        base = model.geom_rgba[g_star, :3]
        shade = base * (0.35 + 0.65 * lambert[:, None])
        hitm = (s_star < BIG / 2)[:, None]
        rgb = jnp.where(hitm, shade, jnp.array([0.12, 0.15, 0.2]))
        rgb = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)
        H, W = cam.height, cam.width
        return rgb.reshape(H, W, 3)[::-1, ::-1], dbuf.reshape(H, W)[::-1, ::-1]

    rgb_p, dbuf_p = jax.jit(pallas_render)(kin)
    np.testing.assert_allclose(np.asarray(dbuf_p), np.asarray(dbuf_j),
                               atol=1e-5)
    close = (np.abs(np.asarray(rgb_p, np.int32)
                    - np.asarray(rgb_j, np.int32)) <= 2).mean()
    assert close > 0.99, f"RGB mismatch fraction {1 - close:.4f}"
