"""Unit parity for the unrolled small-block linear algebra (ops/blockchol.py)
against jnp.linalg, including the ill-conditioned regime that destabilized
the contact solver (arm tree blocks mix ~20 kg masses with ~1e-6 finger
inertias: cond ~1e7 in f32)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_rl_ur5_tpu.ops.blockchol import (
    chol_small, cho_solve_small, solve_lower, solve_upper_t,
)
from mujoco_rl_ur5_tpu.physics.dynamics import inv_blocks


def _spd(rng, b, n, cond=1.0):
    q, _ = np.linalg.qr(rng.randn(b, n, n))
    eigs = np.exp(np.linspace(0.0, np.log(cond), n))[None, :] * rng.uniform(
        0.5, 2.0, (b, 1))
    return (q * eigs[:, None, :]) @ np.swapaxes(q, -1, -2)


def test_chol_small_matches_lax(x64):
    rng = np.random.RandomState(0)
    A = jnp.asarray(_spd(rng, 16, 8), jnp.float64)
    L = chol_small(A)
    Lref = jnp.linalg.cholesky(A)
    np.testing.assert_allclose(np.asarray(L), np.asarray(Lref),
                               rtol=1e-10, atol=1e-12)


def test_cho_solve_small_roundtrip():
    rng = np.random.RandomState(1)
    A = jnp.asarray(_spd(rng, 8, 8), jnp.float32)
    B = jnp.asarray(rng.randn(8, 8, 3), jnp.float32)
    X = cho_solve_small(chol_small(A), B)
    np.testing.assert_allclose(np.asarray(A @ X), np.asarray(B),
                               rtol=2e-4, atol=2e-4)


def test_triangular_substitutions():
    rng = np.random.RandomState(2)
    L = np.tril(rng.randn(4, 6, 6)) + 3.0 * np.eye(6)
    B = rng.randn(4, 6, 2)
    X = solve_lower(jnp.asarray(L), jnp.asarray(B))
    np.testing.assert_allclose(L @ np.asarray(X), B, rtol=1e-4, atol=1e-5)
    Xt = solve_upper_t(jnp.asarray(L), jnp.asarray(B))
    np.testing.assert_allclose(np.swapaxes(L, -1, -2) @ np.asarray(Xt), B,
                               rtol=1e-4, atol=1e-5)


def test_inv_blocks_scale_disparate_f32():
    """The regression that mattered: mass blocks are scale-disparate
    (D^1/2 C D^1/2 with well-conditioned coupling C but diagonal scales
    spanning 1e-6 kg m^2 finger inertias to 20 kg masses => cond ~1e7).
    The equilibrated inverse must stay accurate per-entry in f32; a naive
    explicit inverse carries O(cond * eps) ~ O(1) error here and blew up
    the contact solver after pile settling."""
    rng = np.random.RandomState(3)
    C = _spd(rng, 8, 8, cond=50.0)
    d = 10.0 ** rng.uniform(-6, 1.3, (8, 8))
    A = (C * np.sqrt(d)[:, :, None] * np.sqrt(d)[:, None, :]).astype(np.float32)
    minv = np.asarray(inv_blocks(jnp.asarray(A)))
    ref = np.linalg.inv(A.astype(np.float64))
    err = np.abs(minv - ref) / np.abs(ref).max(axis=(-2, -1), keepdims=True)
    # relative-to-entry check where entries are significant
    sig = np.abs(ref) > 1e-6 * np.abs(ref).max(axis=(-2, -1), keepdims=True)
    rel = np.abs(minv - ref) / np.maximum(np.abs(ref), 1e-300)
    assert np.median(rel[sig]) < 1e-4, f"median rel err {np.median(rel[sig]):.2e}"
    assert err.max() < 1e-3, f"max scaled inverse error {err.max():.2e}"
