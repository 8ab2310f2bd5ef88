"""Break down where ilqr_chain_batch's non-kernel time goes on the chip.

Sections: quad-cost expansion, terminal expansion, Riccati backward
(vmapped associative scan), candidate-cost evaluation, best/LM select.
Usage: python scripts/pallas_solve_profile.py [B] [H]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mujoco_rl_ur5_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from mujoco_rl_ur5_tpu.mpc import GraspMPC
from mujoco_rl_ur5_tpu.mpc.lqr import LQR, backward_parallel
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
    log(f"B={B} H={H}, devices={jax.devices()}")
    mpc = GraspMPC.from_scene(SCENE, horizon=H, use_pallas=True)
    S = mpc.substeps
    nx, nu, nq = mpc.nx, mpc.nu, mpc.nq
    key = jax.random.PRNGKey(0)
    x0 = (jnp.tile(jnp.concatenate([jnp.asarray(mpc.home, jnp.float32),
                                    jnp.zeros(nq)]), (B, 1))
          + 0.01 * jax.random.normal(key, (B, nx)))
    us = jnp.zeros((B, H, nu))
    targets = jnp.tile(jnp.asarray([0.0, -0.6, 1.0], jnp.float32), (B, 1))
    refs = jnp.tile(targets[:, None], (1, H, 1))
    xs = pc.rollout_open(mpc.plan, S, x0, us)
    F, L = pc.lin_fd(mpc.plan, S, xs[:, :H], us)

    cost_fn, term_fn = mpc._reach_stage, mpc._reach_term

    @jax.jit
    def quad(xs, us):
        X, q, U, r = jax.vmap(jax.vmap(mpc._reach_quad))(xs[:, :-1], us, refs)
        XH, qH = jax.vmap(mpc._reach_term_quad)(xs[:, -1], targets)
        return X, q, U, r, XH, qH

    X, q, U, r, XH, qH = quad(xs, us)
    t_quad = timeit("quad-cost expansion", quad, xs, us)

    rg = jnp.full((B,), 1e-6, jnp.float32)

    @jax.jit
    def backward(F, L, X, q, U, r, XH, qH, rg):
        def one(F, L, X, q, U, r, XH, qH, rg):
            p = LQR(F=F, L=L, c=jnp.zeros((H, nx)), X=X, q=q, U=U, r=r,
                    XH=XH, qH=qH)
            return backward_parallel(p, reg=rg)
        return jax.vmap(one)(F, L, X, q, U, r, XH, qH, rg)

    gains = backward(F, L, X, q, U, r, XH, qH, rg)
    t_back = timeit("backward (assoc Riccati)", backward,
                    F, L, X, q, U, r, XH, qH, rg)

    alphas = (1.0, 0.6, 0.3, 0.1, 0.03)
    xs_c, us_c = pc.rollout_closed(mpc.plan, S, x0, xs, us,
                                   gains.K, gains.d, alphas)

    @jax.jit
    def cand_costs(xs_c, us_c):
        def inst(xs_i, us_i, r_i, t_i):
            stage = jax.vmap(cost_fn)(xs_i[:-1], us_i, r_i)
            return stage.sum() + term_fn(xs_i[-1], t_i)
        return jax.vmap(
            lambda xb, ub, rb, tb: jax.vmap(
                lambda xa, ua: inst(xa, ua, rb, tb))(xb, ub)
        )(xs_c, us_c, refs, targets)

    costs = cand_costs(xs_c, us_c)
    t_cand = timeit("candidate costs (B x A x H FK)", cand_costs, xs_c, us_c)

    log(f"--- quad {t_quad*1e3:.0f} + back {t_back*1e3:.0f} + "
        f"cand {t_cand*1e3:.0f} ms per iter (x6 iters)")


if __name__ == "__main__":
    main()
