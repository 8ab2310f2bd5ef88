"""Probe: reproduce/diagnose the BENCH_r02 TPU fault, time step components."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.scene import load_model, make_state

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"


def log(m):
    print(m, file=sys.stderr, flush=True)


def roll_fn(model, K):
    @jax.jit
    def roll(s):
        def body(s, _):
            s2 = jax.vmap(
                lambda x: dynamics.step(model, x, ncon=128, iterations=30)
            )(s)
            return s2, None
        s, _ = jax.lax.scan(body, s, None, length=K)
        return s
    return roll


def main():
    log(f"devices: {jax.devices()}")
    model = load_model(SCENE)
    for B, K in [(256, 10), (1024, 10)]:
        state = make_state(model, (B,))
        state = state.replace(
            qvel=0.01 * jax.random.normal(jax.random.PRNGKey(0), state.qvel.shape))
        roll = roll_fn(model, K)
        t0 = time.perf_counter()
        try:
            out = jax.block_until_ready(roll(state))
            t1 = time.perf_counter()
            out = jax.block_until_ready(roll(state))
            t2 = time.perf_counter()
            log(f"B={B} K={K}: compile+run {t1-t0:.1f}s, steady {t2-t1:.2f}s "
                f"-> {B*K/(t2-t1):,.0f} scen-steps/s, "
                f"qpos finite={bool(jnp.isfinite(out.qpos).all())}")
        except Exception as e:
            log(f"B={B} K={K}: FAILED {type(e).__name__}: {e}")
            break


if __name__ == "__main__":
    main()
