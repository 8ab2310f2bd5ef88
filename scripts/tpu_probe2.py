"""Component breakdown of the contact step on the real TPU chip.

Times (B=256): smooth-only step, collide-only, full step at iterations
{5, 30}; then tries B=1024 with short rolls to reproduce the BENCH_r02
device fault with bounded per-call device time.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.physics.constraints import collide
from mujoco_rl_ur5_tpu.physics.kinematics import fk
from mujoco_rl_ur5_tpu.scene import load_model, make_state

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"


def log(m):
    print(m, file=sys.stderr, flush=True)


def timeit(name, fn, arg, iters=3):
    t0 = time.perf_counter()
    jax.block_until_ready(fn(arg))
    t1 = time.perf_counter()
    ts = []
    for _ in range(iters):
        ta = time.perf_counter()
        jax.block_until_ready(fn(arg))
        ts.append(time.perf_counter() - ta)
    dt = min(ts)
    log(f"{name}: compile+1st {t1-t0:.1f}s, steady {dt*1e3:.1f} ms")
    return dt


def roll(model, K, ncon, iters):
    @jax.jit
    def f(s):
        def body(s, _):
            return jax.vmap(
                lambda x: dynamics.step(model, x, ncon=ncon,
                                        iterations=iters))(s), None
        s, _ = jax.lax.scan(body, s, None, length=K)
        return s
    return f


def main():
    log(f"devices: {jax.devices()}")
    t0 = time.perf_counter()
    model = load_model(SCENE)
    log(f"load_model: {time.perf_counter()-t0:.1f}s")
    B, K = 256, 20
    state = make_state(model, (B,))
    state = state.replace(
        qvel=0.01 * jax.random.normal(jax.random.PRNGKey(0), state.qvel.shape))

    dt = timeit(f"smooth step x{K} B={B}",
                roll(model, K, 0, 0), state)
    log(f"  -> {B*K/dt:,.0f} scen-steps/s (smooth)")

    @jax.jit
    def collide_only(s):
        def one(q):
            kin = fk(model, q)
            _, _, d, p = collide(model, kin)
            return d.sum()
        return jax.vmap(one)(s.qpos)

    dtc = timeit(f"fk+collide B={B}", collide_only, state)
    log(f"  -> {dtc*1e6/B:.0f} us/scenario fk+collide")

    dt5 = timeit(f"contact step it=5 x{K} B={B}",
                 roll(model, K, 128, 5), state)
    log(f"  -> {B*K/dt5:,.0f} scen-steps/s (it=5)")
    dt30 = timeit(f"contact step it=30 x{K} B={B}",
                  roll(model, K, 128, 30), state)
    log(f"  -> {B*K/dt30:,.0f} scen-steps/s (it=30)")

    # fault repro: B=1024, short roll
    B2, K2 = 1024, 10
    s2 = make_state(model, (B2,))
    try:
        dtb = timeit(f"contact step it=30 x{K2} B={B2}",
                     roll(model, K2, 128, 30), s2, iters=2)
        log(f"  -> {B2*K2/dtb:,.0f} scen-steps/s (B=1024)")
    except Exception as e:
        log(f"B=1024 FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
