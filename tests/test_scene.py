"""Scene compiler parity vs the MuJoCo-compiled reference models."""

import mujoco
import numpy as np
import pytest

from mujoco_rl_ur5_tpu.scene import load_model
from tests.conftest import ref_scene

SCENES = [
    "UR5gripper_2_finger.xml",
    "UR5gripper_2_finger_many_objects.xml",
    "UR5gripper_reacher.xml",        # BASELINE config 1 (3-finger + target)
    "UR5gripper_3_finger.xml",       # older 3-finger iteration (SURVEY §2.2)
]


@pytest.fixture(scope="module", params=SCENES)
def pair(request):
    path = ref_scene(request.param)
    return load_model(path), mujoco.MjModel.from_xml_path(path)


def test_sizes(pair):
    m, mm = pair
    t = m.topo
    assert (t.nq, t.nv, t.nu, t.nbody, t.ngeom, t.njnt) == (
        mm.nq, mm.nv, mm.nu, mm.nbody, mm.ngeom, mm.njnt,
    )


def test_qpos0(pair):
    m, mm = pair
    np.testing.assert_allclose(np.asarray(m.qpos0), mm.qpos0, atol=1e-6)


def test_masses(pair):
    m, mm = pair
    np.testing.assert_allclose(
        np.asarray(m.body_mass), mm.body_mass, rtol=2e-3, atol=1e-9
    )


def test_inertia_full_tensor(pair):
    """Principal ordering may differ; compare the full rotated tensors."""
    m, mm = pair

    def full(diag, quat):
        w, x, y, z = quat
        R = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ])
        return R @ np.diag(diag) @ R.T

    bi = np.asarray(m.body_inertia, dtype=np.float64)
    bq = np.asarray(m.body_iquat, dtype=np.float64)
    for b in range(1, m.topo.nbody):
        mine = full(bi[b], bq[b])
        ref = full(mm.body_inertia[b], mm.body_iquat[b])
        scale = max(np.abs(ref).max(), 1e-9)
        assert np.abs(mine - ref).max() / scale < 5e-3, m.topo.body_names[b]


def test_dof_structure(pair):
    m, mm = pair
    t = m.topo
    np.testing.assert_array_equal(t.jnt_type, mm.jnt_type)
    np.testing.assert_array_equal(t.jnt_qposadr, mm.jnt_qposadr)
    np.testing.assert_array_equal(t.jnt_dofadr, mm.jnt_dofadr)
    np.testing.assert_array_equal(t.dof_body, mm.dof_bodyid)
    np.testing.assert_allclose(np.asarray(m.dof_damping), mm.dof_damping, atol=1e-9)
    np.testing.assert_allclose(np.asarray(m.dof_armature), mm.dof_armature, atol=1e-9)


def test_actuators(pair):
    m, mm = pair
    np.testing.assert_allclose(np.asarray(m.act_gear), mm.actuator_gear[:, 0])
    np.testing.assert_allclose(np.asarray(m.act_ctrlrange), mm.actuator_ctrlrange)


def test_cameras(pair):
    m, mm = pair
    t = m.topo
    assert t.ncam == mm.ncam
    np.testing.assert_allclose(np.asarray(m.cam_pos), mm.cam_pos, atol=1e-6)
    np.testing.assert_allclose(np.asarray(m.cam_fovy), mm.cam_fovy)
    # quats may differ in sign
    cq = np.asarray(m.cam_quat, dtype=np.float64)
    for c in range(t.ncam):
        assert (
            np.abs(cq[c] - mm.cam_quat[c]).max() < 1e-5
            or np.abs(cq[c] + mm.cam_quat[c]).max() < 1e-5
        )


def test_tree_structure(pair):
    """Tree decomposition: arm+gripper chain is one tree; objects independent."""
    m, _ = pair
    t = m.topo
    # 2-finger scenes: arm (6) + 2 finger hinges = 8 dofs in the arm tree;
    # the 3-finger gripper has more
    assert t.mtdof >= 8
    arm_tree = t.body_tree[t.body_names.index("shoulder_link")]
    finger_bodies = [b for b in t.body_names if "finger" in b]
    assert finger_bodies, "no finger bodies found"
    for b in finger_bodies:
        assert t.body_tree[t.body_names.index(b)] == arm_tree
    # each tree's dofs have within-tree ancestors only
    for d in range(t.nv):
        anc = t.dof_ancestors[d]
        anc = anc[anc >= 0]
        assert (t.dof_tree[anc] == t.dof_tree[d]).all()
        assert anc[-1] == d  # self included last
