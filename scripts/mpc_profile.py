"""Time the grasp-MPC solve's component passes on the real chip.

Sections (all jitted separately, B scenarios):
  rollout   — open-loop scan of H*substeps chain steps (the line-search cost)
  lin       — one full-horizon linearization (lin_chunks sequential maps)
  backward  — associative-scan Riccati over H
  closed    — one 5-alpha closed-loop rollout (vmapped line search)
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mujoco_rl_ur5_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from mujoco_rl_ur5_tpu.mpc import GraspMPC
from mujoco_rl_ur5_tpu.mpc.lqr import LQR, backward_parallel, rollout_policy

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, *args, iters=3):
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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    log(f"B={B}, devices={jax.devices()}")
    mpc = GraspMPC.from_scene(SCENE, horizon=64)
    H, nx, nu = mpc.H, mpc.nx, mpc.nu
    key = jax.random.PRNGKey(0)
    x0 = jnp.tile(jnp.concatenate([jnp.asarray(mpc.home), jnp.zeros(mpc.nq)]),
                  (B, 1)) + 0.01 * jax.random.normal(key, (B, 2 * mpc.nq))
    us = jnp.zeros((B, H, nu))
    target = jnp.tile(jnp.asarray([0.0, -0.6, 1.0]), (B, 1))

    @jax.jit
    def open_rollout(x0, us):
        def one(x0, us):
            def step(x, u):
                xn = mpc.dyn_step(x, u)
                return xn, x
            xH, xs = jax.lax.scan(step, x0, us)
            return jnp.concatenate([xs, xH[None]], 0)
        return jax.vmap(one)(x0, us)

    xs = open_rollout(x0, us)
    t_roll = timeit("rollout (H*substeps seq steps)", open_rollout, x0, us)

    @jax.jit
    def lin(xs, us):
        def one(xs, us):
            def lin_dyn(x, u):
                F = jax.jacfwd(mpc.dyn_step, argnums=0)(x, u)
                L = jax.jacfwd(mpc.dyn_step, argnums=1)(x, u)
                return F, L
            C = mpc.lin_chunks
            xc = xs[:-1].reshape(C, H // C, nx)
            uc = us.reshape(C, H // C, nu)
            F, L = jax.lax.map(lambda ab: jax.vmap(lin_dyn)(*ab), (xc, uc))
            return F.reshape(H, nx, nx), L.reshape(H, nx, nu)
        return jax.vmap(one)(xs, us)

    F, L = lin(xs, us)
    t_lin = timeit(f"lin (chunks={mpc.lin_chunks})", lin, xs, us)

    @jax.jit
    def backward(F, L):
        def one(F, L):
            p = LQR(F=F, L=L, c=jnp.zeros((H, nx)),
                    X=jnp.tile(jnp.eye(nx)[None], (H, 1, 1)),
                    q=jnp.zeros((H, nx)),
                    U=jnp.tile(jnp.eye(nu)[None], (H, 1, 1)),
                    r=jnp.zeros((H, nu)), XH=jnp.eye(nx), qH=jnp.zeros(nx))
            return backward_parallel(p, reg=1e-6)
        return jax.vmap(one)(F, L)

    gains = backward(F, L)
    t_back = timeit("backward (assoc-scan Riccati)", backward, F, L)

    @jax.jit
    def closed(x0, xs, us, gains):
        alphas = jnp.asarray([1.0, 0.6, 0.3, 0.1, 0.03])

        def one(x0, xs, us, gains):
            def try_a(a):
                return rollout_policy(mpc.dyn_step, x0, xs, us, gains, a,
                                      u_lo=mpc.u_lo, u_hi=mpc.u_hi)
            return jax.vmap(try_a)(alphas)
        return jax.vmap(one, in_axes=(0, 0, 0, 0))(x0, xs, us, gains)

    out = closed(x0, xs, us, gains)
    t_closed = timeit("closed-loop x5 alphas", closed, x0, us=us, xs=xs,
                      gains=gains) if False else timeit(
        "closed-loop x5 alphas", closed, x0, xs, us, gains)

    iters = mpc.iters
    est = iters * (t_lin + t_back + t_closed) + t_roll + (t_lin + t_back)
    log(f"--- per-iter: lin {t_lin*1e3:.0f} + back {t_back*1e3:.0f} + "
        f"closed {t_closed*1e3:.0f} ms; est solve {est:.2f}s "
        f"=> {B/est:.0f} solves/s")


if __name__ == "__main__":
    main()
