"""Time the fused-kernel grasp-MPC path on the real chip.

Sections (jitted separately, B scenarios, H=64, substeps=8 by default):
  rollout_open    — one launch, H knots
  lin_fd          — one launch, (nx+nu+1) FD rollouts per knot
  rollout_closed  — one launch, 5-alpha line search
  solve           — full ilqr_chain_batch via GraspMPC.solve_batch_x

Usage: python scripts/pallas_mpc_profile.py [B] [H] [iters]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mujoco_rl_ur5_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from mujoco_rl_ur5_tpu.mpc import GraspMPC
from mujoco_rl_ur5_tpu.physics import pallas_chain as pc

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
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    H = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 6
    log(f"B={B} H={H} iters={iters}, devices={jax.devices()}")
    mpc = GraspMPC.from_scene(SCENE, horizon=H, iters=iters, use_pallas=True)
    S = mpc.substeps
    nx, nu, nq = mpc.nx, mpc.nu, mpc.nq
    key = jax.random.PRNGKey(0)
    x0 = (jnp.tile(jnp.concatenate([jnp.asarray(mpc.home, jnp.float32),
                                    jnp.zeros(nq)]), (B, 1))
          + 0.01 * jax.random.normal(key, (B, nx)))
    us = jnp.zeros((B, H, nu))
    targets = jnp.tile(jnp.asarray([0.0, -0.6, 1.0], jnp.float32), (B, 1))

    t_open = timeit("rollout_open", lambda: pc.rollout_open(mpc.plan, S, x0, us))
    xs = pc.rollout_open(mpc.plan, S, x0, us)
    t_lin = timeit("lin_fd", lambda: pc.lin_fd(mpc.plan, S, xs[:, :H], us))
    K = jnp.zeros((B, H, nu, nx))
    d = jnp.zeros((B, H, nu))
    alphas = (1.0, 0.6, 0.3, 0.1, 0.03)
    t_cl = timeit("rollout_closed", lambda: pc.rollout_closed(
        mpc.plan, S, x0, xs, us, K, d, alphas))

    t_solve = timeit("solve_batch_x", lambda: mpc.solve_batch_x(x0, targets),
                     iters=2)
    log(f"--- open {t_open*1e3:.0f} lin {t_lin*1e3:.0f} "
        f"closed {t_cl*1e3:.0f} ms; solve {t_solve:.2f}s "
        f"=> {B/t_solve:,.0f} solves/s (target 32,000)")


if __name__ == "__main__":
    main()
