"""Contact-solver behavioral parity vs MuJoCo.

Exact per-step parity through contact is not expected (different solver
family: parallel APGD vs MuJoCo Newton/PGS); these tests check the physically
meaningful invariants: narrowphase distances against MuJoCo's collision
detector, soft-contact rest penetration (set by the shared solref/solimp
model), per-type settling on the bin floor, and statistical pile parity.
"""

import mujoco
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.physics import constraints, dynamics, fk
from mujoco_rl_ur5_tpu.scene import load_model, make_state
from tests.conftest import ref_scene

SCENE = "UR5gripper_2_finger_many_objects.xml"
HOME = [0, -1.57, 1.57, -1.57, -1.57, 0, 0.3, 0.3]


@pytest.fixture(scope="module")
def model():
    return load_model(ref_scene(SCENE))


@pytest.fixture(scope="module")
def mj():
    mm = mujoco.MjModel.from_xml_path(ref_scene(SCENE))
    return mm, mujoco.MjData(mm)


def _pile_qpos(model, seed=0, home=HOME):
    t = model.topo
    rng = np.random.default_rng(seed)
    qpos = np.asarray(model.qpos0).copy()
    qpos[:8] = home
    for j in range(t.njnt):
        if t.jnt_type[j] == 0:
            qa = t.jnt_qposadr[j]
            qpos[qa:qa + 3] = [rng.uniform(-.25, .25), rng.uniform(-.77, -.43), rng.uniform(1.0, 1.5)]
            q = rng.standard_normal(4)
            qpos[qa + 3:qa + 7] = q / np.linalg.norm(q)
    return qpos


def _free_joints(t):
    return [j for j in range(t.njnt) if t.jnt_type[j] == 0]


def test_narrowphase_distances_match_mujoco(model, mj):
    """Active contact (pair, dist) sets agree with MuJoCo's detector."""
    t = model.topo
    mm, dd = mj
    qpos = _pile_qpos(model, seed=7)
    dd.qpos[:] = qpos
    mujoco.mj_forward(mm, dd)
    kin = fk(model, jnp.asarray(qpos))
    con = constraints.make_contacts(model, kin, 256)
    act = np.nonzero(np.asarray(con.active))[0]
    mine = {}
    for i in act:
        g1, g2 = int(np.asarray(con.geom1)[i]), int(np.asarray(con.geom2)[i])
        d = float(np.asarray(con.dist)[i])
        key = (min(g1, g2), max(g1, g2))
        mine[key] = min(mine.get(key, np.inf), d)
    ref = {}
    for c in range(dd.ncon):
        g1, g2 = int(dd.contact.geom1[c]), int(dd.contact.geom2[c])
        key = (min(g1, g2), max(g1, g2))
        ref[key] = min(ref.get(key, np.inf), float(dd.contact.dist[c]))
    # every mujoco object-object/bin contact deeper than 1mm must be found
    # with a distance within 5mm (proxy/cylinder approximations allowed)
    missing = []
    for key, d in ref.items():
        types = {int(mm.geom_type[key[0]]), int(mm.geom_type[key[1]])}
        if d < -1e-3 and key not in mine and 5 not in types:  # exempt cylinder
            missing.append((key, d))
    assert not missing, missing
    for key, d in mine.items():
        if key in ref:
            types = {int(mm.geom_type[key[0]]), int(mm.geom_type[key[1]])}
            if 5 in types:
                continue  # cylinders collide as capsules (known deviation)
            # deep spawn overlaps (>1 cm) may differ more between contact
            # definitions (corner sampling vs SAT); scale tolerance
            tol = max(5e-3, 0.5 * abs(ref[key]))
            assert abs(d - ref[key]) < tol, (key, d, ref[key])


@pytest.mark.parametrize("obj_idx,name", [(0, "sphere"), (12, "box"), (33, "capsule"), (22, "cylinder")])
def test_object_rests_on_bin_floor(model, obj_idx, name):
    t = model.topo
    free = _free_joints(t)
    qpos = np.asarray(model.qpos0).copy()
    qpos[:8] = HOME
    for k, j in enumerate(free):
        qa = t.jnt_qposadr[j]
        if k == obj_idx:
            qpos[qa:qa + 3] = [0.0, -0.6, 1.0]
        else:
            qpos[qa:qa + 3] = [30 + k, 30, 1.0]
        qpos[qa + 3:qa + 7] = [1, 0, 0, 0]
    state = make_state(model).replace(qpos=jnp.asarray(qpos))
    stepper = jax.jit(lambda s: dynamics.step(model, s, ncon=128, iterations=40))
    for _ in range(500):
        state = stepper(state)
    qa = t.jnt_qposadr[free[obj_idx]]
    z = float(np.asarray(state.qpos)[qa + 2])
    vz = float(np.asarray(state.qvel)[t.jnt_dofadr[free[obj_idx]] + 2])
    assert 0.88 < z < 0.97, (name, z)
    assert abs(vz) < 0.05, (name, vz)


def test_rest_penetration_matches_soft_model(model, mj):
    """Steady-state sphere penetration is set by solref/solimp; compare with
    MuJoCo's equilibrium for the same single-contact configuration."""
    t = model.topo
    mm, dd = mj
    free = _free_joints(t)
    qpos = np.asarray(model.qpos0).copy()
    qpos[:8] = HOME
    for k, j in enumerate(free):
        qa = t.jnt_qposadr[j]
        qpos[qa:qa + 3] = [0.0, -0.6, 0.96] if k == 0 else [30 + k, 30, 2.0]
        qpos[qa + 3:qa + 7] = [1, 0, 0, 0]
    # mine
    state = make_state(model).replace(qpos=jnp.asarray(qpos))
    stepper = jax.jit(lambda s: dynamics.step(model, s, ncon=128, iterations=40))
    for _ in range(400):
        state = stepper(state)
    z_mine = float(np.asarray(state.qpos)[t.jnt_qposadr[free[0]] + 2])
    # mujoco
    mujoco.mj_resetData(mm, dd)
    dd.qpos[:] = qpos
    for _ in range(400):
        mujoco.mj_step(mm, dd)
    z_ref = float(dd.qpos[mm.jnt_qposadr[free[0]] + 2])
    assert abs(z_mine - z_ref) < 1.5e-3, (z_mine, z_ref)


def test_pile_settles_like_mujoco(model, mj):
    t = model.topo
    mm, dd = mj
    qpos = _pile_qpos(model, seed=0)
    state = make_state(model).replace(qpos=jnp.asarray(qpos))
    stepper = jax.jit(lambda s: dynamics.step(model, s, ncon=256, iterations=40))
    mujoco.mj_resetData(mm, dd)
    dd.qpos[:] = qpos
    for _ in range(2000):
        state = stepper(state)
        mujoco.mj_step(mm, dd)
    qp = np.asarray(state.qpos)
    zs = np.array([qp[t.jnt_qposadr[j] + 2] for j in _free_joints(t)])
    zr = np.array([dd.qpos[mm.jnt_qposadr[j] + 2] for j in _free_joints(t)])
    assert np.isfinite(qp).all()
    # statistical parity. Objects dropped from up to 1.5 m occasionally
    # bounce OUT of the bin in BOTH engines (measured over 8 seeds: ours
    # 16/320 escapes vs mujoco 22/320) — escapes are chaotic, so compare
    # the rest height over IN-BIN objects and bound the occupancy gap.
    in_mine = np.abs(zs - 0.95) < 0.15
    in_ref = np.abs(zr - 0.95) < 0.15
    assert abs(zs[in_mine].mean() - zr[in_ref].mean()) < 0.02, (
        zs[in_mine].mean(), zr[in_ref].mean())
    assert abs(int(in_mine.sum()) - int(in_ref.sum())) <= 6, (
        int(in_mine.sum()), int(in_ref.sum()))
    # nothing below the ground plane by more than a few mm
    assert zs.min() > -0.01


def test_pile_long_roll_stays_bounded(model):
    """Late-time stability regression at the bench configuration
    (ncon=256, iterations=30): an inaccurate explicit M^-1 (round-3
    un-equilibrated f32 inverse) fed ~O(1)-error Delassus/matvec values to
    the solver and velocities blew up exponentially AFTER the pile settled
    (~step 800) — a window the 2000-step it=40 parity test above happened
    to miss. scan-based roll, seeds chosen to reproduce the blowup."""
    t = model.topo
    B = 2
    qpos = np.stack([_pile_qpos(model, seed=s) for s in (3, 7)])
    state = make_state(model, (B,)).replace(qpos=jnp.asarray(qpos))

    @jax.jit
    def roll(s):
        def body(s, _):
            s2 = jax.vmap(lambda x: dynamics.step(
                model, x, ncon=256, iterations=30))(s)
            return s2, jnp.max(jnp.abs(s2.qvel))
        return jax.lax.scan(body, s, None, length=1000)

    out, vmaxs = roll(state)
    assert np.isfinite(np.asarray(out.qpos)).all()
    assert np.isfinite(np.asarray(out.qvel)).all()
    # settled (in-workspace) objects must be at rest; spawn-overlap ejections
    # (an object launched by a deep random-quaternion interpenetration) are
    # chaotic and happen in BOTH engines — bound their count, not velocity
    qp, qv = np.asarray(out.qpos), np.asarray(out.qvel)
    ejected, settled_vmax = 0, 0.0
    for b in range(B):
        for j in _free_joints(t):
            qa, da = int(t.jnt_qposadr[j]), int(t.jnt_dofadr[j])
            p = qp[b, qa:qa + 3]
            in_ws = (abs(p[0]) < 1.5) and (-1.5 < p[1] < 0.5) and (0.0 < p[2] < 1.5)
            if in_ws:
                settled_vmax = max(settled_vmax, float(np.abs(qv[b, da:da + 6]).max()))
            else:
                ejected += 1
    assert ejected <= 3 * B, f"{ejected} objects ejected"
    # residual spin after an ejection-and-return decays slowly (rolling
    # friction 1e-4); the regression signature was exponential growth to
    # 1e6+/NaN, so the bound only needs to exclude that regime
    assert settled_vmax < 200.0, f"in-workspace vmax {settled_vmax}"
