"""Riccati backward-pass math tests (mpc/lqr.py), run in float64:
parallel associative-scan vs sequential scan parity, convergence to the
algebraic (DARE) fixed point, and an optimality certificate for the
closed-loop LQR policy. Separate module so the x64 fixture cannot leak
into the f32 GraspMPC tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_rl_ur5_tpu.mpc import (
    LQR, backward_parallel, backward_sequential,
)

def random_lqr(key, H=24, nx=6, nu=3, dtype=jnp.float64):
    """A well-conditioned random time-varying LQT problem."""
    ks = jax.random.split(key, 8)

    def psd(k, n, scale):
        A = jax.random.normal(k, (H, n, n), dtype) * scale
        return A @ jnp.swapaxes(A, -1, -2) + 0.5 * jnp.eye(n, dtype=dtype)

    F = jnp.eye(nx, dtype=dtype) + 0.1 * jax.random.normal(
        ks[0], (H, nx, nx), dtype)
    L = 0.3 * jax.random.normal(ks[1], (H, nx, nu), dtype)
    c = 0.1 * jax.random.normal(ks[2], (H, nx), dtype)
    X = psd(ks[3], nx, 0.3)
    q = 0.2 * jax.random.normal(ks[4], (H, nx), dtype)
    U = psd(ks[5], nu, 0.3)
    r = 0.2 * jax.random.normal(ks[6], (H, nu), dtype)
    A = jax.random.normal(ks[7], (nx, nx), dtype) * 0.3
    XH = A @ A.T + 0.5 * jnp.eye(nx, dtype=dtype)
    qH = jnp.zeros((nx,), dtype)
    return LQR(F, L, c, X, q, U, r, XH, qH)


# -- Riccati backward passes ----------------------------------------------------


@pytest.mark.usefixtures("x64")
def test_parallel_riccati_matches_sequential():
    """associative_scan pass == classic recursion (Sarkka-Garcia-Fernandez
    parallel LQT) on random time-varying problems."""
    for seed in range(3):
        p = random_lqr(jax.random.PRNGKey(seed))
        gs = backward_sequential(p, reg=0.0)
        gp = backward_parallel(p, reg=0.0)
        np.testing.assert_allclose(gp.S, gs.S, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(gp.s, gs.s, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(gp.K, gs.K, rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(gp.d, gs.d, rtol=1e-8, atol=1e-8)


@pytest.mark.usefixtures("x64")
def test_riccati_converges_to_dare():
    """On a time-invariant problem over a long horizon, S_0 must reach the
    algebraic Riccati fixed point: S = X + F'(S - S L (U + L'S L)^-1 L'S) F."""
    nx, nu, H = 4, 2, 120
    rng = np.random.default_rng(0)
    F1 = np.eye(nx) + 0.05 * rng.standard_normal((nx, nx))
    L1 = 0.2 * rng.standard_normal((nx, nu))
    X1 = np.eye(nx)
    U1 = np.eye(nu)
    p = LQR(
        F=jnp.tile(jnp.asarray(F1)[None], (H, 1, 1)),
        L=jnp.tile(jnp.asarray(L1)[None], (H, 1, 1)),
        c=jnp.zeros((H, nx)),
        X=jnp.tile(jnp.asarray(X1)[None], (H, 1, 1)),
        q=jnp.zeros((H, nx)),
        U=jnp.tile(jnp.asarray(U1)[None], (H, 1, 1)),
        r=jnp.zeros((H, nu)),
        XH=jnp.asarray(X1),
        qH=jnp.zeros((nx,)),
    )
    for backward in (backward_sequential, backward_parallel):
        S0 = np.asarray(backward(p, reg=0.0).S[0])
        # verify the DARE residual directly
        M = S0 - S0 @ L1 @ np.linalg.solve(
            U1 + L1.T @ S0 @ L1, L1.T @ S0)
        resid = X1 + F1.T @ M @ F1 - S0
        # finite-horizon S_0 approaches the fixed point geometrically;
        # at H=120 the residual is ~1e-7
        assert np.abs(resid).max() < 1e-6, backward.__name__


@pytest.mark.usefixtures("x64")
def test_lqr_policy_is_optimal_perturbation():
    """Rolling out the LQR policy must beat any perturbed policy on the
    true quadratic objective (certificate of optimality, not just parity)."""
    p = random_lqr(jax.random.PRNGKey(42), H=16, nx=4, nu=2)
    g = backward_sequential(p, reg=0.0)
    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(4))

    def cost_of(us):
        def stepf(x, inp):
            u, (F, L, c, X, q, U, r) = inp
            stage = (0.5 * x @ X @ x + q @ x + 0.5 * u @ U @ u + r @ u)
            xn = F @ x + L @ u + c
            return xn, stage
        xH, stages = jax.lax.scan(
            stepf, x0, (us, (p.F, p.L, p.c, p.X, p.q, p.U, p.r)))
        return stages.sum() + 0.5 * xH @ p.XH @ xH + p.qH @ xH

    # optimal controls from the closed-loop rollout through the TRUE dynamics
    def rollout():
        def stepf(x, inp):
            F, L, c, K, d = inp
            u = K @ x + d
            return F @ x + L @ u + c, u
        _, us = jax.lax.scan(stepf, x0, (p.F, p.L, p.c, g.K, g.d))
        return us

    us_opt = rollout()
    c_opt = float(cost_of(us_opt))
    rng = np.random.default_rng(3)
    for _ in range(5):
        us_pert = us_opt + 0.01 * jnp.asarray(
            rng.standard_normal(us_opt.shape))
        assert float(cost_of(us_pert)) > c_opt - 1e-12


