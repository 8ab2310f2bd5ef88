"""Time-varying LQR / LQT backward passes: sequential and parallel-in-time.

The reference has no trajectory optimizer at all — its "planner" is ikpy IK
+ per-joint PID loops executed serially for up to 10,000 physics steps per
motion (MujocoController.py:269-384). This module is the TPU-native engine
that replaces that loop: the Riccati recursion over the horizon is expressed
as an ASSOCIATIVE operation and evaluated with `jax.lax.associative_scan`,
so the backward pass costs O(log H) sequential depth instead of O(H) — the
horizon axis becomes a parallel axis exactly like the batch axis
(SURVEY.md §2.4 "horizon parallelism").

Problem (per scenario; vmap over a leading batch axis):

    x_{k+1} = F_k x_k + L_k u_k + c_k                       k = 0..H-1
    cost    = sum_k [ 1/2 x'X_k x + q_k'x + 1/2 u'U_k u + r_k'u ]
              + 1/2 x'X_H x + q_H'x

Value functions are V_k(x) = 1/2 x'S_k x + s_k'x (+const); the policy is
u_k = K_k x + d_k.

Parallel formulation: conditional value functions V_{i->j}(x, z) are closed
under composition and representable by 5-tuples (A, b, C, eta, J) with

    V(x, z) = max_l [ l'(z - A x - b) - 1/2 l'C l ] + 1/2 x'J x - eta'x,

composed by the combination below (associative). This is the LQT
parallelization of Sarkka & Garcia-Fernandez, "Temporal Parallelization of
Dynamic Programming and Linear Quadratic Regulators" (IEEE TAC 2021) —
re-derived here for the iLQR linear/affine cost terms. Correctness is gated
against the sequential recursion in tests/test_mpc.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.ops.blockchol import (
    chol_small, cho_solve_small, solve_general_small,
)


class LQR(NamedTuple):
    """Stacked time-varying LQT problem data (leading axis = horizon H for
    F/L/c/X/q/U/r at steps 0..H-1; XH/qH are the terminal expansions)."""

    F: jax.Array    # (H, nx, nx)
    L: jax.Array    # (H, nx, nu)
    c: jax.Array    # (H, nx)
    X: jax.Array    # (H, nx, nx) stage state Hessians
    q: jax.Array    # (H, nx)     stage state gradients (at x = 0)
    U: jax.Array    # (H, nu, nu) stage control Hessians (PD)
    r: jax.Array    # (H, nu)     stage control gradients
    XH: jax.Array   # (nx, nx)    terminal Hessian
    qH: jax.Array   # (nx,)       terminal gradient


class Gains(NamedTuple):
    K: jax.Array    # (H, nu, nx)
    d: jax.Array    # (H, nu)
    S: jax.Array    # (H+1, nx, nx) value Hessians
    s: jax.Array    # (H+1, nx)     value gradients


def _sym(M):
    return 0.5 * (M + jnp.swapaxes(M, -1, -2))


def _gains_from_value(p: LQR, S1, s1, reg):
    """Per-step policy from the NEXT step's value function (S1 = S_{k+1}).

    Quu = U + L'S1L (+reg), Qux = L'S1F, Qu = r + L'(S1 c + s1);
    K = -Quu^{-1} Qux, d = -Quu^{-1} Qu.
    All inputs carry a leading H axis; solved batched (VPU/MXU-friendly)."""
    LT = jnp.swapaxes(p.L, -1, -2)
    Quu = p.U + LT @ S1 @ p.L
    Quu = _sym(Quu) + reg * jnp.eye(p.U.shape[-1], dtype=p.U.dtype)
    Qux = LT @ S1 @ p.F
    Qu = p.r + (LT @ (S1 @ p.c[..., None] + s1[..., None]))[..., 0]
    # unrolled Cholesky solves (ops/blockchol): the cho_factor/cho_solve
    # custom-calls cost ~10x more than fused VPU ops at these (7, 7) shapes
    cho = chol_small(Quu)
    K = -cho_solve_small(cho, Qux)
    d = -cho_solve_small(cho, Qu[..., None])[..., 0]
    return K, d, Quu, Qux, Qu


def backward_sequential(p: LQR, reg: float = 1e-8) -> Gains:
    """Classic Riccati recursion via lax.scan (O(H) depth). Ground truth for
    the parallel pass; also the better choice for very small H."""
    nx = p.F.shape[-1]

    def step(carry, inp):
        S1, s1 = carry
        F, L, c, X, q, U, r = inp
        pk = LQR(F, L, c, X, q, U, r, p.XH, p.qH)
        K, d, Quu, Qux, Qu = _gains_from_value(pk, S1, s1, reg)
        FT = jnp.swapaxes(F, -1, -2)
        Qxx = X + FT @ S1 @ F
        Qx = q + (FT @ (S1 @ c[..., None] + s1[..., None]))[..., 0]
        KT = jnp.swapaxes(K, -1, -2)
        S = _sym(Qxx + jnp.swapaxes(Qux, -1, -2) @ K)
        s = Qx + KT @ Qu + (KT @ Quu + jnp.swapaxes(Qux, -1, -2)) @ d
        return (S, s), (K, d, S1, s1)

    (S0, s0), (K, d, Snext, snext) = jax.lax.scan(
        step, (p.XH, p.qH), (p.F, p.L, p.c, p.X, p.q, p.U, p.r),
        reverse=True)
    # reverse scan stacks outputs in forward order: Snext[k] = S_{k+1}
    S = jnp.concatenate([S0[None], Snext], axis=0)   # (H+1, nx, nx)
    s = jnp.concatenate([s0[None], snext], axis=0)
    return Gains(K=K, d=d, S=S, s=s)


# -- parallel (associative-scan) pass -----------------------------------------


class _Elem(NamedTuple):
    A: jax.Array
    b: jax.Array
    C: jax.Array
    eta: jax.Array
    J: jax.Array


def _combine(e1: _Elem, e2: _Elem) -> _Elem:
    """Compose V_{i->k} (e1, earlier) with V_{k->j} (e2, later)."""
    nx = e1.A.shape[-1]
    I = jnp.eye(nx, dtype=e1.A.dtype)
    # (I + C1 J2)^-1 once; PSD C, J => invertible. Unrolled pivoted
    # Gauss-Jordan (ops/blockchol): jnp.linalg.solve's LU custom-call
    # dominated the whole backward pass at (B*H, 16, 16) on TPU.
    M = solve_general_small(I + e1.C @ e2.J,
                            jnp.broadcast_to(I, e1.C.shape))
    MT = jnp.swapaxes(M, -1, -2)  # equals (I + J2 C1)^-T ... see below
    A2M = e2.A @ M
    A = A2M @ e1.A
    b = (A2M @ (e1.b[..., None] + e1.C @ e2.eta[..., None]))[..., 0] + e2.b
    C = _sym(A2M @ e1.C @ jnp.swapaxes(e2.A, -1, -2) + e2.C)
    # (I + J2 C1)^{-1} = (I + (C1 J2)')^{-T} = M' when C, J symmetric
    A1T = jnp.swapaxes(e1.A, -1, -2)
    eta = (A1T @ MT @ (e2.eta[..., None] - e2.J @ e1.b[..., None]))[..., 0] \
        + e1.eta
    J = _sym(A1T @ MT @ e2.J @ e1.A + e1.J)
    return _Elem(A, b, C, eta, J)


def backward_parallel(p: LQR, reg: float = 1e-8) -> Gains:
    """Associative-scan Riccati: O(log H) sequential depth over the horizon.

    Builds H step elements + 1 terminal element, suffix-composes them with
    `lax.associative_scan(reverse=True)`, reads off V_k = (J_k, -eta_k),
    then forms all H feedback gains in one batched solve."""
    H, nx = p.F.shape[0], p.F.shape[-1]
    nu = p.L.shape[-1]
    dt = p.F.dtype

    # per-step elements: A=F, b = c - L U^{-1} r, C = L U^{-1} L',
    # J = X, eta = -q   (derivation in module docstring)
    Uc = chol_small(p.U + reg * jnp.eye(nu, dtype=dt))
    Uinv_r = cho_solve_small(Uc, p.r[..., None])
    Uinv_LT = cho_solve_small(Uc, jnp.swapaxes(p.L, -1, -2))
    A = p.F
    b = p.c - (p.L @ Uinv_r)[..., 0]
    C = _sym(p.L @ Uinv_LT)
    J = p.X
    eta = -p.q

    # terminal element
    zA = jnp.zeros((1, nx, nx), dt)
    elems = _Elem(
        A=jnp.concatenate([A, zA]),
        b=jnp.concatenate([b, jnp.zeros((1, nx), dt)]),
        C=jnp.concatenate([C, jnp.zeros((1, nx, nx), dt)]),
        eta=jnp.concatenate([eta, -p.qH[None]]),
        J=jnp.concatenate([J, p.XH[None]]),
    )
    # associative_scan(reverse=True) feeds the combine (later, earlier) —
    # verified empirically; _combine's convention is (earlier, later)
    suff = jax.lax.associative_scan(
        lambda a, b: _combine(b, a), elems, reverse=True)
    S = suff.J                       # (H+1, nx, nx): S_k for k = 0..H
    s = -suff.eta                    # (H+1, nx)
    K, d, _, _, _ = _gains_from_value(p, S[1:], s[1:], reg)
    return Gains(K=K, d=d, S=S, s=s)


def rollout_policy(dyn_step, x0, xbar, ubar, gains: Gains, alpha,
                   u_lo=None, u_hi=None):
    """Closed-loop forward rollout of the iLQR policy
    u_k = ubar_k + alpha d_k + K_k (x - xbar_k) through the TRUE dynamics.
    Optional box clamp keeps the nominal controls inside actuator limits
    (the dynamics clip anyway — clamping here keeps the next linearization
    at the control the plant actually sees)."""

    def step(x, inp):
        xb, ub, K, d = inp
        u = ub + alpha * d + K @ (x - xb)
        if u_lo is not None:
            u = jnp.clip(u, u_lo, u_hi)
        xn = dyn_step(x, u)
        return xn, (x, u)

    xH, (xs, us) = jax.lax.scan(step, x0, (xbar[:-1], ubar, gains.K, gains.d))
    xs = jnp.concatenate([xs, xH[None]], axis=0)
    return xs, us
