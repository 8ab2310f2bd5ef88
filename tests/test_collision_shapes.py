"""Shape-fidelity contact tests (VERDICT round-1 weak #7): true cylinder
narrowphase (prism hull, not a capsule proxy) and box-box edge-edge SAT —
the crossed-edge case that decides finger-box edge grasps."""

import tempfile

import mujoco
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.physics.collision import BIG, box_box
from mujoco_rl_ur5_tpu.scene import load_model, make_state

CYL_XML = """<mujoco><option timestep='0.002' iterations='50'/><worldbody>
<geom name='floor' type='plane' size='2 2 .1' condim='3'/>
<body name='c' pos='0 0 0.2'><freejoint/>
<geom type='cylinder' size='0.03 0.015' mass='0.1' condim='3'
 solref='.01 1' solimp='.99 .99 .01'/></body>
</worldbody></mujoco>"""


def _qmul(a, b):
    w1, x1, y1, z1 = a
    w2, x2, y2, z2 = b
    return np.array([
        w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
        w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
        w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
        w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
    ])


@pytest.fixture(scope="module")
def cyl_model():
    path = tempfile.mktemp(suffix=".xml")
    with open(path, "w") as f:
        f.write(CYL_XML)
    return load_model(path), path


def _settle(model, qpos0=None, steps=600):
    st = make_state(model)
    if qpos0 is not None:
        st = st.replace(qpos=jnp.asarray(qpos0, st.qpos.dtype))

    @jax.jit
    def roll(s):
        def body(s, _):
            return dynamics.step(model, s, ncon=16, iterations=50), None
        return jax.lax.scan(body, s, None, length=steps)[0]

    return roll(st)


def _settle_mj(path, qpos0=None, steps=600):
    mm = mujoco.MjModel.from_xml_path(path)
    dd = mujoco.MjData(mm)
    if qpos0 is not None:
        dd.qpos[:] = qpos0
    for _ in range(steps):
        mujoco.mj_step(mm, dd)
    return dd


def test_cylinder_flat_end_rest(cyl_model):
    """A cylinder dropped on its flat end rests at z ~ hl (the round-1
    capsule proxy bulged a hemispherical cap past the flat end)."""
    model, path = cyl_model
    out = _settle(model)
    dd = _settle_mj(path)
    z_ours, z_mj = float(out.qpos[2]), float(dd.qpos[2])
    assert abs(z_ours - z_mj) < 1.5e-3, (z_ours, z_mj)
    assert abs(z_ours - 0.015) < 2e-3


def test_cylinder_side_rest(cyl_model):
    """Side rest at z ~ r, matching MuJoCo."""
    model, path = cyl_model
    q0 = np.zeros(7)
    q0[:3] = [0, 0, 0.1]
    q0[3:7] = [np.cos(np.pi / 4), np.sin(np.pi / 4), 0, 0]
    out = _settle(model, q0)
    dd = _settle_mj(path, q0)
    assert abs(float(out.qpos[2]) - float(dd.qpos[2])) < 1.5e-3
    assert abs(float(out.qpos[2]) - 0.03) < 2e-3


def test_box_box_edge_contact_depth():
    """Crossed boxes penetrating edge-on-edge with NO vertex inside either
    box: corner sampling alone misses it; the SAT edge contact must fire
    with MuJoCo's penetration depth."""
    s = np.array([0.1, 0.02, 0.02])
    qz = np.array([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    qx = np.array([np.cos(np.pi / 8), np.sin(np.pi / 8), 0, 0])
    q2 = _qmul(qx, qz)

    pos, nrm, dist = box_box(
        jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]), jnp.asarray(s),
        jnp.asarray([0.0, 0.0, 0.045]), jnp.asarray(q2), jnp.asarray(s))
    d = np.asarray(dist)
    active = d < BIG / 2
    assert active[-1], "edge-edge contact did not fire"
    assert not active[:-1].any(), "corner sampling unexpectedly fired"

    xml = ("<mujoco><worldbody>"
           "<body name='a'><geom type='box' size='0.1 0.02 0.02'/></body>"
           f"<body name='b' pos='0 0 0.045' "
           f"quat='{q2[0]} {q2[1]} {q2[2]} {q2[3]}'><freejoint/>"
           "<geom type='box' size='0.1 0.02 0.02' mass='0.1'/></body>"
           "</worldbody></mujoco>")
    path = tempfile.mktemp(suffix=".xml")
    with open(path, "w") as f:
        f.write(xml)
    mm = mujoco.MjModel.from_xml_path(path)
    dd = mujoco.MjData(mm)
    mujoco.mj_forward(mm, dd)
    assert dd.ncon > 0, "mujoco sees contact"
    mj_depth = float(dd.contact.dist[:dd.ncon].min())
    assert abs(float(d[-1]) - mj_depth) < 2e-3, (float(d[-1]), mj_depth)
    # normal = cross of the two edge directions (x and the 45-deg-tilted
    # long axis -> (0, -s, c)), oriented from box1 up into box2
    assert float(nrm[-1][2]) > 0.5
    expect = np.array([0.0, -np.sin(np.pi / 4), np.cos(np.pi / 4)])
    np.testing.assert_allclose(np.abs(np.asarray(nrm[-1])), np.abs(expect),
                               atol=1e-3)


def test_box_box_separated_no_edge_contact():
    s = jnp.asarray([0.1, 0.02, 0.02])
    qz = jnp.asarray([np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)])
    _, _, dist = box_box(jnp.zeros(3), jnp.asarray([1.0, 0, 0, 0]), s,
                         jnp.asarray([0.0, 0.0, 0.08]), qz, s)
    assert (np.asarray(dist[-1]) > BIG / 2) or float(dist[-1]) > 0


def test_face_rest_unchanged_by_edge_contact(cyl_model):
    """A box resting face-on-face must not be disturbed by the edge term
    (the edge contact must stay inactive when a face axis wins)."""
    s1 = jnp.asarray([0.03, 0.03, 0.03])
    s2 = jnp.asarray([0.028, 0.028, 0.03])   # slightly narrower: corners
    ident = jnp.asarray([1.0, 0, 0, 0])       # strictly inside, like any
    _, _, dist = box_box(jnp.zeros(3), ident, s1,   # real (jittered) rest
                         jnp.asarray([0.0, 0.0, 0.0595]), ident, s2)
    d = np.asarray(dist)
    assert (d[:8] < 0).sum() >= 4          # corner contacts active
    assert d[-1] > BIG / 2                  # edge contact masked out
