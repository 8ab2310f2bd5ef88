"""Gates for the Pallas-fused arm dynamics kernels (physics/pallas_chain.py)
against the plain-JAX chain dynamics (physics/chain.py) they accelerate.

Runs in pallas interpret mode on the CPU backend (the kernels auto-switch;
pallas_chain._interpret). Shapes are kept tiny because interpret mode traces
the kernel body into regular JAX — the full H=64/substeps=8 configuration
runs compiled on the chip via bench.py and mpc/pallas_ilqr.py.

The reference has no analogue (its dynamics is the mujoco_py C engine,
stepped serially — MujocoController.py:318-384); the parity surface here is
internal: kernels must reproduce chain_step, which is itself parity-gated
against dynamics.step and MuJoCo in tests/test_chain.py.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import ref_scene

from mujoco_rl_ur5_tpu.physics import pallas_chain as pc
from mujoco_rl_ur5_tpu.physics.chain import chain_step, make_chain_plan
from mujoco_rl_ur5_tpu.scene.reduce import load_arm_model

SCENE = ref_scene("UR5gripper_2_finger_many_objects.xml")
SUBSTEPS = 2
H = 4


@pytest.fixture(scope="module")
def plan():
    return make_chain_plan(load_arm_model(SCENE))


def _knot_ref(plan):
    def knot(x, u):
        q, v = x[: plan.nv], x[plan.nv:]
        for _ in range(SUBSTEPS):
            q, v = chain_step(plan, q, v, u)
        return jnp.concatenate([q, v])
    return knot


def _rollout_ref(plan, x0, us):
    knot = _knot_ref(plan)

    def one(x0, us):
        def step(x, u):
            xn = knot(x, u)
            return xn, x
        xH, xs = jax.lax.scan(step, x0, us)
        return jnp.concatenate([xs, xH[None]], 0)

    return jax.vmap(one)(x0, us)


def _rand_states(plan, B, key):
    nv = plan.nv
    q0 = jnp.asarray([0.0, -1.57, 1.57, -1.57, -1.57, 0, 0, 0][:nv],
                     jnp.float32)
    k1, k2 = jax.random.split(key)
    x0 = (jnp.tile(jnp.concatenate([q0, jnp.zeros(nv)]), (B, 1))
          + 0.05 * jax.random.normal(k1, (B, 2 * nv)))
    us = 0.1 * jax.random.normal(k2, (B, H, plan.nu))
    return x0, us


def test_tile_packing_roundtrip():
    x = jnp.arange(5 * 3 * 2, dtype=jnp.float32).reshape(5, 3, 2)
    t = pc.to_tiles(x)
    assert t.shape == (1, 3, 2) + pc.TILE
    np.testing.assert_array_equal(np.asarray(pc.from_tiles(t, 5)),
                                  np.asarray(x))


def test_rollout_open_matches_chain_step(plan):
    x0, us = _rand_states(plan, 5, jax.random.PRNGKey(0))
    xs = pc.rollout_open(plan, SUBSTEPS, x0, us)
    ref = _rollout_ref(plan, x0, us)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_lin_fd_matches_jacfwd(plan):
    nv, nu = plan.nv, plan.nu
    nx = 2 * nv
    x0, us = _rand_states(plan, 3, jax.random.PRNGKey(1))
    xs = _rollout_ref(plan, x0, us)[:, :H]
    F, L = pc.lin_fd(plan, SUBSTEPS, xs, us)
    assert F.shape == (3, H, nx, nx) and L.shape == (3, H, nx, nu)
    knot = _knot_ref(plan)
    Fr = jax.vmap(jax.vmap(jax.jacfwd(knot, argnums=0)))(xs, us)
    Lr = jax.vmap(jax.vmap(jax.jacfwd(knot, argnums=1)))(xs, us)
    # forward differences with eps=1e-3 in f32: absolute error ~1e-3 on
    # O(1) Jacobian entries is the expected FD truncation + roundoff
    assert float(jnp.abs(F - Fr).max()) < 5e-3
    assert float(jnp.abs(L - Lr).max()) < 5e-3


def test_rollout_closed_matches_policy_rollout(plan):
    from mujoco_rl_ur5_tpu.mpc.lqr import Gains, rollout_policy

    nv, nu = plan.nv, plan.nu
    nx = 2 * nv
    B = 3
    alphas = (1.0, 0.3)
    x0, us = _rand_states(plan, B, jax.random.PRNGKey(2))
    xbar = _rollout_ref(plan, x0, us)
    key = jax.random.PRNGKey(3)
    K = 0.05 * jax.random.normal(key, (B, H, nu, nx))
    d = 0.1 * jax.random.normal(jax.random.PRNGKey(4), (B, H, nu))
    lo = jnp.asarray(plan.ctrlrange[:, 0], jnp.float32)
    hi = jnp.asarray(plan.ctrlrange[:, 1], jnp.float32)

    xs_p, us_p = pc.rollout_closed(plan, SUBSTEPS, x0, xbar, us, K, d, alphas)
    assert xs_p.shape == (B, len(alphas), H + 1, nx)

    knot = _knot_ref(plan)
    zeros = jnp.zeros
    for ai, a in enumerate(alphas):
        def one(x0, xb, ub, Kb, db):
            g = Gains(K=Kb, d=db, S=zeros((H + 1, nx, nx)),
                      s=zeros((H + 1, nx)))
            return rollout_policy(knot, x0, xb, ub, g, a, u_lo=lo, u_hi=hi)
        xs_r, us_r = jax.vmap(one)(x0, xbar, us, K, d)
        np.testing.assert_allclose(np.asarray(xs_p[:, ai]), np.asarray(xs_r),
                                   atol=5e-5, rtol=1e-3)
        np.testing.assert_allclose(np.asarray(us_p[:, ai]), np.asarray(us_r),
                                   atol=5e-5, rtol=1e-3)


def test_batch_padding(plan):
    """Non-tile-multiple batches round-trip through the lane packing."""
    x0, us = _rand_states(plan, 7, jax.random.PRNGKey(5))
    xs = pc.rollout_open(plan, SUBSTEPS, x0, us)
    ref = _rollout_ref(plan, x0, us)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_backward_pallas_matches_sequential():
    """The fused Riccati backward kernel (mpc/pallas_lqr.py) equals
    vmap(backward_sequential) bit-for-algorithm on random LQT data,
    including per-scenario LM regularization. Small nx/nu: interpret mode
    unrolls the grid, so the CPU gate uses a small-matrix instance of the
    same generic kernel (the TPU shapes are exercised by bench.py)."""
    from mujoco_rl_ur5_tpu.mpc.lqr import LQR, backward_sequential
    from mujoco_rl_ur5_tpu.mpc.pallas_lqr import backward_pallas

    B, H, nx_, nu_ = 3, 4, 4, 2
    ks = jax.random.split(jax.random.PRNGKey(7), 8)
    F = 0.1 * jax.random.normal(ks[0], (B, H, nx_, nx_)) + jnp.eye(nx_)
    L = 0.1 * jax.random.normal(ks[1], (B, H, nx_, nu_))
    c = jnp.zeros((B, H, nx_))
    W = jax.random.normal(ks[2], (B, H, nx_, nx_))
    X = 0.1 * W @ jnp.swapaxes(W, -1, -2) + jnp.eye(nx_)
    q = jax.random.normal(ks[3], (B, H, nx_))
    U = jnp.tile(jnp.eye(nu_), (B, H, 1, 1))
    r = jax.random.normal(ks[4], (B, H, nu_))
    WH = jax.random.normal(ks[5], (B, nx_, nx_))
    XH = 0.1 * WH @ jnp.swapaxes(WH, -1, -2) + jnp.eye(nx_)
    qH = jax.random.normal(ks[6], (B, nx_))
    rg = jnp.asarray([1e-6, 1e-3, 1.0])

    ref = jax.vmap(
        lambda F, L, c, X, q, U, r, XH, qH, rg: backward_sequential(
            LQR(F, L, c, X, q, U, r, XH, qH), reg=rg)
    )(F, L, c, X, q, U, r, XH, qH, rg)
    out = backward_pallas(F, L, X, q, U, r, XH, qH, rg)
    for name in ("K", "d", "S", "s"):
        a, b = getattr(out, name), getattr(ref, name)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-4, err_msg=name)


def test_rollout_closed_fused_costs_match_xla():
    """rollout_closed's in-kernel cost accumulation (reach AND track
    builders from GraspMPC._build_kernel_costs) equals the XLA stage-cost
    sum over the same candidate trajectories."""
    from mujoco_rl_ur5_tpu.mpc import GraspMPC
    from mujoco_rl_ur5_tpu.mpc.lqr import Gains, rollout_policy
    from mujoco_rl_ur5_tpu.scene.compile import load_model
    from mujoco_rl_ur5_tpu.scene.reduce import load_arm_model

    mpc = GraspMPC(load_model(SCENE), arm_model=load_arm_model(SCENE),
                   horizon=H, substeps=SUBSTEPS, use_pallas=True)
    plan = mpc.plan
    B, nx, nu = 3, 2 * plan.nv, plan.nu
    x0, us = _rand_states(plan, B, jax.random.PRNGKey(11))
    xbar = _rollout_ref(plan, x0, us)
    K = 0.05 * jax.random.normal(jax.random.PRNGKey(12), (B, H, nu, nx))
    d = 0.1 * jax.random.normal(jax.random.PRNGKey(13), (B, H, nu))
    alphas = (1.0, 0.3)

    tg = jnp.tile(jnp.asarray([0.0, -0.6, 1.0]), (B, 1))
    refs = jnp.tile(tg[:, None], (1, H, 1))
    xs_c, us_c, costs = pc.rollout_closed(
        plan, SUBSTEPS, x0, xbar, us, K, d, alphas,
        cost=mpc._k_reach, sref=None, tref=tg)

    def xla_cost(xs_i, us_i, t):
        stage = jax.vmap(lambda x, u: mpc._reach_stage(x, u, t))(
            xs_i[:-1], us_i)
        return stage.sum() + mpc._reach_term(xs_i[-1], t)

    ref_costs = jax.vmap(lambda xb, ub, t: jax.vmap(
        lambda xa, ua: xla_cost(xa, ua, t))(xb, ub))(xs_c, us_c, tg)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_costs),
                               rtol=2e-4, atol=1e-4)

    # track mode: per-knot streamed refs
    q_refs = jnp.tile(x0[:, None, : plan.nv], (1, H + 1, 1))
    qd_refs = jnp.zeros_like(q_refs)
    sref = jnp.concatenate([q_refs[:, :-1], qd_refs[:, :-1]], -1)
    tref = jnp.concatenate([q_refs[:, -1], qd_refs[:, -1]], -1)
    xs_c, us_c, costs = pc.rollout_closed(
        plan, SUBSTEPS, x0, xbar, us, K, d, alphas,
        cost=mpc._k_track, sref=sref, tref=tref)

    def xla_cost_t(xs_i, us_i, qr, vr):
        stage = jax.vmap(lambda x, u, a, b: mpc._track_stage(x, u, (a, b)))(
            xs_i[:-1], us_i, qr[:-1], vr[:-1])
        return stage.sum() + mpc._track_term(xs_i[-1], (qr[-1], vr[-1]))

    ref_costs = jax.vmap(lambda xb, ub, qr, vr: jax.vmap(
        lambda xa, ua: xla_cost_t(xa, ua, qr, vr))(xb, ub))(
        xs_c, us_c, q_refs, qd_refs)
    np.testing.assert_allclose(np.asarray(costs), np.asarray(ref_costs),
                               rtol=2e-4, atol=1e-4)
