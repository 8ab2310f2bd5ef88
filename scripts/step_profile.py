"""Break down the batched contact step's time on the chip.

Sections (jitted separately, vmapped over B): fk, collide (narrowphase
over all candidate pairs), make_contacts (top-ncon selection + Jacobians),
constraint_forces (APGD solve), smooth pipeline (mass/bias/integrate), and
the full dynamics.step.

Usage: python scripts/step_profile.py [B] [ncon] [iters]
"""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mujoco_rl_ur5_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np

from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.physics.kinematics import fk
from mujoco_rl_ur5_tpu.scene import load_model, make_state

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
    ncon = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 30
    log(f"B={B} ncon={ncon} iters={iters}, devices={jax.devices()}")
    model = load_model(SCENE)
    state = make_state(model, (B,))
    state = state.replace(qvel=0.01 * jax.random.normal(
        jax.random.PRNGKey(0), state.qvel.shape))

    from mujoco_rl_ur5_tpu.physics.constraints import (
        collide, constraint_forces, make_contacts,
    )

    vfk = jax.jit(jax.vmap(lambda q: fk(model, q)))
    kin = vfk(state.qpos)
    timeit("fk", lambda q: vfk(q), state.qpos)

    vcol = jax.jit(jax.vmap(lambda k: collide(model, k)))
    timeit("collide (narrowphase)", vcol, kin)

    vmk = jax.jit(jax.vmap(lambda k: make_contacts(model, k, ncon)))
    cs = vmk(kin)
    timeit(f"make_contacts (top-{ncon} + jacobians)", vmk, kin)

    @jax.jit
    def smooth(st):
        def one(s):
            return dynamics.step(model, s, ncon=0)
        return jax.vmap(one)(st)

    timeit("smooth step (ncon=0)", smooth, state)

    @jax.jit
    def full(st):
        def one(s):
            return dynamics.step(model, s, ncon=ncon, iterations=iters)
        return jax.vmap(one)(st)

    t_full = timeit("full contact step", full, state)

    @jax.jit
    def roll(st):
        def body(s, _):
            return jax.vmap(lambda x: dynamics.step(
                model, x, ncon=ncon, iterations=iters))(s), None
        s, _ = jax.lax.scan(body, st, None, length=25)
        return s

    t_roll = timeit("25-step roll", roll, state, iters=2)
    log(f"--- {B / (t_roll / 25):,.0f} scenario-steps/s "
        f"(single-call {B / t_full:,.0f})")


if __name__ == "__main__":
    main()
