"""Pallas-fused Riccati backward pass: the iLQR backward in ONE launch.

Why — measured on the chip (scripts/backward_profile.py, B=4096 H=64,
nx=16 nu=7): the batched sequential recursion (mpc/lqr.backward_sequential
under vmap) costs hundreds of ms per call because XLA lowers each of the
64 sequential steps to dozens of small batched-(16,16) ops whose launch
latency and layout shuffles dominate — the same disease the chain-dynamics
kernels (physics/pallas_chain.py) cured for the rollouts. The backward
pass is the last serial boundary of the solve loop outside a kernel.

Design (batch-in-lanes, like pallas_chain):
  * every per-scenario scalar — one entry of S_k, Quu, K — is one (8, 128)
    f32 tile of 1024 scenarios, so each FMA in the small-matrix algebra is
    ONE VPU instruction for the whole tile;
  * the horizon is a (reversed) grid axis: the kernel body is exactly one
    Riccati step (~10k vector statements after symmetric-entry dedup;
    Mosaic compile time scales with body size), and the value function
    (S, s) carries across grid steps in VMEM scratch — Pallas TPU grids
    execute sequentially, the same contract rollout_closed relies on;
  * symmetric matrices (S, Quu, Qxx) are built as upper triangles whose
    mirrored entries are the SAME traced value, so the dedup happens at
    trace time, not in Mosaic;
  * the (7, 7) Quu Cholesky and triangular solves are fully unrolled
    scalar recurrences over lane tiles — the in-kernel analogue of
    ops/blockchol.chol_small (whose docstring records why LAPACK-style
    custom calls lose at these shapes);
  * per-scenario Levenberg-Marquardt regularization streams in as a lane
    tile, mirroring backward_sequential's `reg` semantics (Quu + reg I).

Semantics: identical to `vmap(backward_sequential)` with c = 0 (the iLQR
formulates the subproblem in deviation coordinates, mpc/pallas_ilqr.py) —
parity-gated in tests/test_pallas_chain.py::test_backward_pallas_matches_
sequential. Returns the same Gains pytree (K, d, S, s).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from mujoco_rl_ur5_tpu.mpc.lqr import Gains
from mujoco_rl_ur5_tpu.physics.pallas_chain import (
    TILE, _interpret, from_tiles, sadd, smul, ssub, to_tiles,
)


def _dot(xs, ys):
    """Symbolic dot product of two entry lists."""
    return sadd(*[smul(x, y) for x, y in zip(xs, ys)])


def _chol(A, n, eps=1e-12):
    """Unrolled lower-Cholesky of a symbolic symmetric n x n; returns
    (Lc, inv_diag). Mirrors ops/blockchol.chol_small."""
    Lc = [[0.0] * n for _ in range(n)]
    inv_d = [0.0] * n
    for j in range(n):
        d = ssub(A[j][j], sadd(*[smul(Lc[j][k], Lc[j][k])
                                 for k in range(j)], 0.0))
        d = jnp.maximum(d, eps)
        root = jnp.sqrt(d)
        Lc[j][j] = root
        inv_d[j] = 1.0 / root
        for i in range(j + 1, n):
            off = ssub(A[i][j], sadd(*[smul(Lc[i][k], Lc[j][k])
                                       for k in range(j)], 0.0))
            Lc[i][j] = smul(off, inv_d[j])
    return Lc, inv_d


def _cho_solve(Lc, inv_d, b, n):
    """Solve A x = b (one rhs as an entry list) given chol(A)."""
    y = [0.0] * n
    for i in range(n):
        y[i] = smul(ssub(b[i], sadd(*[smul(Lc[i][k], y[k])
                                      for k in range(i)], 0.0)), inv_d[i])
    x = [0.0] * n
    for i in reversed(range(n)):
        x[i] = smul(ssub(y[i], sadd(*[smul(Lc[k][i], x[k])
                                      for k in range(i + 1, n)], 0.0)),
                    inv_d[i])
    return x


@functools.partial(jax.jit, static_argnums=())
def backward_pallas(F: jax.Array, L: jax.Array, X: jax.Array, q: jax.Array,
                    U: jax.Array, r: jax.Array, XH: jax.Array,
                    qH: jax.Array, reg: jax.Array) -> Gains:
    """Batched Riccati backward pass, one kernel launch.

    F (B,H,nx,nx), L (B,H,nx,nu), X (B,H,nx,nx), q (B,H,nx), U (B,H,nu,nu),
    r (B,H,nu), XH (B,nx,nx), qH (B,nx), reg (B,) -> Gains with a leading
    batch axis (K (B,H,nu,nx), d (B,H,nu), S (B,H+1,nx,nx), s (B,H+1,nx)).
    """
    B, H, nx, nu = L.shape
    f = F.dtype

    def kernel(F_ref, L_ref, X_ref, q_ref, U_ref, r_ref, XH_ref, qH_ref,
               rg_ref, K_ref, d_ref, SS_ref, ss_ref, S0_ref, s0_ref,
               S_sc, s_sc):
        j = pl.program_id(1)
        rg = rg_ref[0]

        @pl.when(j == 0)
        def _():
            for i in range(nx):
                s_sc[i] = qH_ref[0, i]
                for k in range(nx):
                    S_sc[i, k] = XH_ref[0, i, k]

        # load carry (S_{k+1}, s_{k+1}) and this step's blocks
        S1 = [[S_sc[i, k] for k in range(nx)] for i in range(nx)]
        s1 = [s_sc[i] for i in range(nx)]
        Fm = [[F_ref[0, 0, i, k] for k in range(nx)] for i in range(nx)]
        Lm = [[L_ref[0, 0, i, a] for a in range(nu)] for i in range(nx)]
        Xm = [[X_ref[0, 0, i, k] for k in range(nx)] for i in range(nx)]
        qv = [q_ref[0, 0, i] for i in range(nx)]
        Um = [[U_ref[0, 0, a, b] for b in range(nu)] for a in range(nu)]
        rv = [r_ref[0, 0, a] for a in range(nu)]

        # emit the carry into the stacked value outputs (slot k+1)
        for i in range(nx):
            ss_ref[0, 0, i] = s1[i]
            for k in range(nx):
                SS_ref[0, 0, i, k] = S1[i][k]

        # SL = S1 @ L (nx, nu); column view for L' products
        SL = [[_dot(S1[i], [Lm[k][a] for k in range(nx)])
               for a in range(nu)] for i in range(nx)]
        Lcol = [[Lm[i][a] for i in range(nx)] for a in range(nu)]
        SLcol = [[SL[i][a] for i in range(nx)] for a in range(nu)]

        # Quu = U + L' S1 L + reg I (symmetric: shared upper entries)
        Quu = [[None] * nu for _ in range(nu)]
        for a in range(nu):
            for b in range(a, nu):
                v = sadd(Um[a][b], _dot(Lcol[a], SLcol[b]))
                if a == b:
                    v = sadd(v, rg)
                Quu[a][b] = Quu[b][a] = v

        # Qux = L' S1 F (nu, nx); Qu = r + L' s1
        Fcol = [[Fm[i][k] for i in range(nx)] for k in range(nx)]
        Qux = [[_dot(SLcol[a], Fcol[k]) for k in range(nx)]
               for a in range(nu)]
        Qu = [sadd(rv[a], _dot(Lcol[a], s1)) for a in range(nu)]

        Lc, inv_d = _chol(Quu, nu)
        # K = -Quu^{-1} Qux (solve per state column), d = -Quu^{-1} Qu
        Km = [[None] * nx for _ in range(nu)]
        for k in range(nx):
            col = _cho_solve(Lc, inv_d, [Qux[a][k] for a in range(nu)], nu)
            for a in range(nu):
                Km[a][k] = -col[a]
        dsol = _cho_solve(Lc, inv_d, Qu, nu)
        dv = [-dsol[a] for a in range(nu)]
        for a in range(nu):
            d_ref[0, 0, a] = dv[a]
            for k in range(nx):
                K_ref[0, 0, a, k] = Km[a][k]

        # Qxx = X + F' S1 F (symmetric); Qx = q + F' s1
        T_ = [[_dot(S1[i], Fcol[k]) for k in range(nx)] for i in range(nx)]
        Tcol = [[T_[i][k] for i in range(nx)] for k in range(nx)]
        Qxx = [[None] * nx for _ in range(nx)]
        for i in range(nx):
            for k in range(i, nx):
                Qxx[i][k] = Qxx[k][i] = sadd(Xm[i][k],
                                             _dot(Fcol[i], Tcol[k]))
        Qx = [sadd(qv[i], _dot(Fcol[i], s1)) for i in range(nx)]

        # S = sym(Qxx + Qux' K); s = Qx + K'Qu + (K'Quu + Qux') d
        Quxc = [[Qux[a][i] for a in range(nu)] for i in range(nx)]
        Kcol = [[Km[a][k] for a in range(nu)] for k in range(nx)]
        G = [[_dot(Quxc[i], Kcol[k]) for k in range(nx)] for i in range(nx)]
        Snew = [[None] * nx for _ in range(nx)]
        for i in range(nx):
            for k in range(i, nx):
                v = sadd(Qxx[i][k],
                         smul(0.5, sadd(G[i][k], G[k][i])))
                Snew[i][k] = Snew[k][i] = v
        snew = []
        for i in range(nx):
            kq = [sadd(_dot(Kcol[i], [Quu[a][b] for a in range(nu)]),
                       Quxc[i][b]) for b in range(nu)]
            snew.append(sadd(Qx[i], _dot(Kcol[i], Qu), _dot(kq, dv)))

        for i in range(nx):
            s_sc[i] = snew[i]
            for k in range(nx):
                S_sc[i, k] = Snew[i][k]

        @pl.when(j == H - 1)
        def _():
            for i in range(nx):
                s0_ref[0, i] = snew[i]
                for k in range(nx):
                    S0_ref[0, i, k] = Snew[i][k]

    Ft, Lt, Xt, qt, Ut, rt = (to_tiles(a) for a in (F, L, X, q, U, r))
    XHt, qHt, rgt = to_tiles(XH), to_tiles(qH), to_tiles(reg)
    T = Ft.shape[0]

    def step_spec(*dims):
        nd = len(dims)
        return pl.BlockSpec((1, 1) + dims + TILE,
                            lambda t, j: (t, H - 1 - j) + (0,) * (nd + 2),
                            memory_space=pltpu.VMEM)

    def const_spec(*dims):
        nd = len(dims)
        return pl.BlockSpec((1,) + dims + TILE,
                            lambda t, j: (t,) + (0,) * (nd + 2),
                            memory_space=pltpu.VMEM)

    K, d, SS, ss, S0, s0 = pl.pallas_call(
        kernel,
        grid=(T, H),
        in_specs=[
            step_spec(nx, nx), step_spec(nx, nu), step_spec(nx, nx),
            step_spec(nx), step_spec(nu, nu), step_spec(nu),
            const_spec(nx, nx), const_spec(nx), const_spec(),
        ],
        out_specs=(
            step_spec(nu, nx), step_spec(nu),
            # value stack: S_{k+1}/s_{k+1} land in slot k+1 = H - j
            pl.BlockSpec((1, 1, nx, nx) + TILE,
                         lambda t, j: (t, H - j, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, nx) + TILE,
                         lambda t, j: (t, H - j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            const_spec(nx, nx), const_spec(nx),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((T, H, nu, nx) + TILE, f),
            jax.ShapeDtypeStruct((T, H, nu) + TILE, f),
            jax.ShapeDtypeStruct((T, H + 1, nx, nx) + TILE, f),
            jax.ShapeDtypeStruct((T, H + 1, nx) + TILE, f),
            jax.ShapeDtypeStruct((T, nx, nx) + TILE, f),
            jax.ShapeDtypeStruct((T, nx) + TILE, f),
        ),
        scratch_shapes=[pltpu.VMEM((nx, nx) + TILE, f),
                        pltpu.VMEM((nx,) + TILE, f)],
        interpret=_interpret(),
    )(Ft, Lt, Xt, qt, Ut, rt, XHt, qHt, rgt)

    K = from_tiles(K, B)
    d = from_tiles(d, B)
    S = from_tiles(SS, B).at[:, 0].set(from_tiles(S0, B))
    s = from_tiles(ss, B).at[:, 0].set(from_tiles(s0, B))
    return Gains(K=K, d=d, S=S, s=s)
