"""Time the Riccati backward passes (sequential vs parallel) at MPC shapes.

Usage: python scripts/backward_profile.py [B] [H]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mujoco_rl_ur5_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from mujoco_rl_ur5_tpu.mpc.lqr import (
    LQR, backward_parallel, backward_sequential,
)


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, *args, iters=5):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(*args))
    log(f"{name}: compile+1st {time.perf_counter()-t0:.1f}s")
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        ts.append(time.perf_counter() - t0)
    t = min(ts)
    log(f"{name}: {t*1e3:.1f} ms")
    return t


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    nx, nu = 16, 7
    log(f"B={B} H={H} nx={nx} nu={nu}, devices={jax.devices()}")
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    F = 0.1 * jax.random.normal(ks[0], (B, H, nx, nx)) \
        + jnp.eye(nx)
    L = 0.1 * jax.random.normal(ks[1], (B, H, nx, nu))
    c = jnp.zeros((B, H, nx))
    W = jax.random.normal(ks[2], (B, H, nx, nx))
    X = 0.1 * W @ jnp.swapaxes(W, -1, -2) + jnp.eye(nx)
    q = jax.random.normal(ks[3], (B, H, nx))
    U = jnp.tile(jnp.eye(nu), (B, H, 1, 1))
    r = jax.random.normal(ks[4], (B, H, nu))
    WH = jax.random.normal(ks[5], (B, nx, nx))
    XH = 0.1 * WH @ jnp.swapaxes(WH, -1, -2) + jnp.eye(nx)
    qH = jax.random.normal(ks[6], (B, nx))

    def run(backward):
        @jax.jit
        def f(F, L, c, X, q, U, r, XH, qH):
            def one(F, L, c, X, q, U, r, XH, qH):
                return backward(LQR(F, L, c, X, q, U, r, XH, qH), reg=1e-6)
            return jax.vmap(one)(F, L, c, X, q, U, r, XH, qH)
        return f

    rg = jnp.full((B,), 1e-6, jnp.float32)
    seq = run(backward_sequential)
    par = run(backward_parallel)
    timeit("sequential", seq, F, L, c, X, q, U, r, XH, qH)
    timeit("parallel", par, F, L, c, X, q, U, r, XH, qH)
    from mujoco_rl_ur5_tpu.mpc.pallas_lqr import backward_pallas
    timeit("pallas", backward_pallas, F, L, X, q, U, r, XH, qH, rg)


if __name__ == "__main__":
    main()
