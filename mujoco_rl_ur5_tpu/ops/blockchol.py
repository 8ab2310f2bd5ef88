"""Unrolled dense linear algebra for tiny SPD blocks (mtdof <= ~16).

The dynamics pipeline factorizes thousands of (mtdof, mtdof) per-tree mass
blocks per step (batch x ntree of them). XLA:TPU lowers
``jnp.linalg.cholesky`` / ``triangular_solve`` on such shapes to generic
custom-calls that cost ~8.5 ms per call at (256*41, 8, 8) — profiled at
~30% of the whole contact step (BENCH_r02 analysis). Since the block width
is a compile-time constant and tiny, the factorization/substitution loops
are unrolled HERE into straight-line elementwise ops + small einsums that
XLA fuses into a handful of VPU kernels: >10x faster than the custom-calls
at these shapes, and they batch perfectly over scenarios.

All functions accept arbitrary leading batch dims and operate on the last
two axes. ``n`` is static (taken from the shape).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def chol_small(A: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Cholesky factor L (lower) of SPD blocks A (..., n, n), unrolled."""
    n = A.shape[-1]
    cols = []
    for j in range(n):
        a_j = A[..., :, j]                                # (..., n)
        if j:
            Lj = jnp.stack([c[..., j] for c in cols], -1)  # (..., j)
            Lmat = jnp.stack(cols, -1)                     # (..., n, j)
            a_j = a_j - jnp.einsum("...ik,...k->...i", Lmat, Lj)
        d = jnp.sqrt(jnp.maximum(a_j[..., j], eps))
        col = a_j / d[..., None]
        keep = np.arange(n) >= j
        col = jnp.where(jnp.asarray(keep), col, 0.0)
        col = col.at[..., j].set(d)
        cols.append(col)
    return jnp.stack(cols, -1)


def solve_lower(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L X = B for lower-triangular L (..., n, n), B (..., n, m)."""
    n = L.shape[-1]
    rows = []
    for i in range(n):
        b_i = B[..., i, :]                                # (..., m)
        if i:
            Li = L[..., i, :i]                            # (..., i)
            X = jnp.stack(rows, -2)                       # (..., i, m)
            b_i = b_i - jnp.einsum("...k,...km->...m", Li, X)
        rows.append(b_i / L[..., i, i][..., None])
    return jnp.stack(rows, -2)


def solve_upper_t(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve L^T X = B (backward substitution), L lower-tri, B (..., n, m)."""
    n = L.shape[-1]
    rows = [None] * n
    for i in reversed(range(n)):
        b_i = B[..., i, :]
        if i < n - 1:
            Lcol = L[..., i + 1:, i]                      # (..., n-1-i)
            X = jnp.stack(rows[i + 1:], -2)               # (..., n-1-i, m)
            b_i = b_i - jnp.einsum("...k,...km->...m", Lcol, X)
        rows[i] = b_i / L[..., i, i][..., None]
    return jnp.stack(rows, -2)


def cho_solve_small(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B given L = chol_small(A); B (..., n, m)."""
    return solve_upper_t(L, solve_lower(L, B))


def inv_spd_small(A: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Explicit inverse of SPD blocks via the unrolled Cholesky."""
    n = A.shape[-1]
    L = chol_small(A, eps)
    eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), A.shape)
    return cho_solve_small(L, eye)


def solve_general_small(A: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve A X = B for GENERAL (non-symmetric) tiny blocks A (..., n, n),
    B (..., n, m) via fully unrolled Gauss-Jordan with partial pivoting.

    Exists for the parallel-Riccati combine (mpc/lqr.py): its
    (I + C J)^{-1} blocks are non-symmetric 16x16, and `jnp.linalg.solve`
    lowers to an LU custom-call that costs ~700 ms per backward pass at
    (B*H, 16, 16) on TPU — the dominant term of the whole MPC solve.
    Unrolled, the same solve is a few hundred fused VPU ops. Pivot
    selection uses one-hot matmuls (no gathers)."""
    n = A.shape[-1]
    M = jnp.concatenate([A, B], -1)                  # (..., n, n+m)
    idx = np.arange(n)
    for k in range(n):
        col = jnp.abs(M[..., :, k])
        col = jnp.where(jnp.asarray(idx >= k), col, -1.0)
        P = jax.nn.one_hot(jnp.argmax(col, -1), n, dtype=M.dtype)
        rowp = jnp.einsum("...n,...nm->...m", P, M)
        rowk = M[..., k, :]
        e_k = jnp.asarray((idx == k), M.dtype)
        # swap rows k <-> pivot (corrections cancel when pivot == k)
        M = (M + e_k[:, None] * (rowp - rowk)[..., None, :]
             + P[..., None] * (rowk - rowp)[..., None, :])
        piv = M[..., k, k]
        rk = M[..., k, :] / piv[..., None]
        f = jnp.where(jnp.asarray(idx == k), 0.0, M[..., :, k])
        M = M - f[..., None] * rk[..., None, :]
        M = jnp.where(e_k[:, None] != 0, rk[..., None, :], M)
    return M[..., n:]


def solve_spd_scaled(A: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve A x = b for SPD A (..., n, n), b (..., n) with Jacobi
    equilibration: factor D^-1/2 A D^-1/2 (D = diag A). Mass matrices mix
    ~20 kg masses with ~1e-6 kg m^2 inertias (cond ~1e7); the scaled system
    has cond ~1e2, keeping the f32 unrolled Cholesky accurate where the
    plain factorization suffers catastrophic cancellation."""
    import jax

    d = jnp.diagonal(A, axis1=-2, axis2=-1)
    s = jax.lax.rsqrt(jnp.maximum(d, 1e-30))
    As = A * s[..., :, None] * s[..., None, :]
    y = cho_solve_small(chol_small(As), (b * s)[..., None])[..., 0]
    return y * s
