"""Headline TPU benchmark for mujoco_rl_ur5_tpu.

Run on the real chip (no platform forcing). Prints ONE JSON line on stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

Headline metric: grasp-MPC solves/s/chip at H=64, B=4096 (BASELINE.md build
target: 4096 parallel solves at H=64 in REAL TIME, i.e. 4096 solves per
64 * 2 ms = 0.128 s -> 32,000 solves/s == vs_baseline 1.0). Until/unless the
MPC import is available, the headline falls back to batched contact-dynamics
throughput expressed as a real-time factor.

All progress/diagnostics go to stderr; stdout carries exactly one JSON line.

Usage: python bench.py [--quick]   (--quick: smaller batches / fewer iters
for smoke-testing the harness itself; the driver runs the full version.)
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"
TIMESTEP = 0.002
REALTIME_SOLVES_PER_S = 4096.0 / (64 * TIMESTEP)   # 32,000 (BASELINE target)


def log(msg: str) -> None:
    print(msg, file=sys.stderr, flush=True)


def timed(fn, *args, warmup: int = 1, iters: int = 3):
    """Median wall time of fn(*args) after warmup (fn must block)."""
    for _ in range(warmup):
        fn(*args)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        fn(*args)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def bench_dynamics(model, quick: bool):
    """Batched contact step throughput: scenario-steps/s at several B."""
    from mujoco_rl_ur5_tpu.physics import dynamics
    from mujoco_rl_ur5_tpu.scene import make_state

    out = {}
    for B in ([256] if quick else [256, 1024, 4096]):
        K = 50 if (quick or B >= 4096) else 200
        state = make_state(model, (B,))
        # randomize qvel slightly so contacts are active
        state = state.replace(
            qvel=0.01 * jax.random.normal(jax.random.PRNGKey(0),
                                          state.qvel.shape))

        @jax.jit
        def roll(s):
            def body(s, _):
                s2 = jax.vmap(
                    lambda x: dynamics.step(model, x, ncon=128, iterations=30)
                )(s)
                return s2, None
            s, _ = jax.lax.scan(body, s, None, length=K)
            return s

        t0 = time.perf_counter()
        jax.block_until_ready(roll(state))
        log(f"dynamics B={B}: compile+1st run {time.perf_counter()-t0:.1f}s")
        dt = timed(lambda s: jax.block_until_ready(roll(s)), state)
        rate = B * K / dt
        out[f"dynamics_steps_per_s_B{B}"] = round(rate)
        log(f"dynamics B={B}: {rate:,.0f} scenario-steps/s "
            f"(= {rate*TIMESTEP:,.0f}x real-time)")
    return out


def bench_render(model, quick: bool):
    """On-device RGB-D render throughput at 200x200."""
    from mujoco_rl_ur5_tpu.physics.kinematics import fk
    from mujoco_rl_ur5_tpu.render import make_camera
    from mujoco_rl_ur5_tpu.render.raycast import render_rgbd
    from mujoco_rl_ur5_tpu.scene import make_state

    B = 32 if quick else 256
    cam = make_camera(model, "top_down", 200, 200)
    state = make_state(model, (B,))

    @jax.jit
    def frames(qpos):
        def one(q):
            return render_rgbd(model, fk(model, q), cam)
        return jax.vmap(one)(qpos)

    t0 = time.perf_counter()
    jax.block_until_ready(frames(state.qpos))
    log(f"render B={B}: compile+1st run {time.perf_counter()-t0:.1f}s")
    dt = timed(lambda q: jax.block_until_ready(frames(q)), state.qpos)
    rate = B / dt
    log(f"render: {rate:,.0f} RGB-D 200x200 frames/s")
    return {"rgbd_frames_per_s_200x200": round(rate)}


def bench_env(model, quick: bool):
    """Full GraspEnv: batched reset (settle 500 steps) + one full scripted
    pick-&-place (the ~6k-step phase machine) per scenario."""
    from mujoco_rl_ur5_tpu.env import GraspEnv

    B = 8 if quick else 16
    scale = 0.1 if quick else 1.0
    env = GraspEnv(model, ncon=128, iterations=30, image_width=200,
                   image_height=200, budget_scale=scale)
    reset = jax.jit(jax.vmap(env.reset))
    step = jax.jit(jax.vmap(env.step))

    keys = jax.random.split(jax.random.PRNGKey(0), B)
    t0 = time.perf_counter()
    es = jax.block_until_ready(reset(keys))
    log(f"env.reset B={B}: compile+1st run {time.perf_counter()-t0:.1f}s")
    dt_reset = timed(lambda k: jax.block_until_ready(reset(k)), keys,
                     warmup=0, iters=2)

    # aim each scenario at its closest pixel (top of pile)
    d = np.asarray(es.depth)
    acts = []
    for b in range(B):
        y, x = np.unravel_index(np.argmin(d[b]), d[b].shape)
        acts.append([int(y) * 200 + int(x), b % 6])
    actions = jnp.asarray(acts, jnp.int32)

    t0 = time.perf_counter()
    jax.block_until_ready(step(es, actions))
    log(f"env.step B={B}: compile+1st run {time.perf_counter()-t0:.1f}s")
    dt_step = timed(lambda e, a: jax.block_until_ready(step(e, a)),
                    es, actions, warmup=0, iters=1)
    log(f"env: reset {B/dt_reset:,.1f}/s, full pick-&-place "
        f"{B/dt_step:,.2f}/s (B={B}, scale={scale})")
    return {
        "env_resets_per_s": round(B / dt_reset, 2),
        "env_grasp_steps_per_s": round(B / dt_step, 3),
        "env_batch": B,
        "env_budget_scale": scale,
    }


def bench_mpc(model, quick: bool):
    """North-star metric: batched grasp-MPC solves/s at H=64."""
    try:
        from mujoco_rl_ur5_tpu.mpc import GraspMPC
    except ImportError:
        return None
    from mujoco_rl_ur5_tpu.scene import make_state

    B = 256 if quick else 4096
    H = 64
    mpc = GraspMPC.from_scene(SCENE, horizon=H)
    state = make_state(model, (B,))
    targets = jnp.tile(jnp.asarray([0.0, -0.6, 1.0]), (B, 1))
    solve = jax.jit(mpc.solve_batch)
    t0 = time.perf_counter()
    jax.block_until_ready(solve(state, targets))
    log(f"mpc B={B} H={H}: compile+1st run {time.perf_counter()-t0:.1f}s")
    dt = timed(lambda s, t: jax.block_until_ready(solve(s, t)),
               state, targets)
    rate = B / dt
    log(f"mpc: {rate:,.0f} solves/s (target {REALTIME_SOLVES_PER_S:,.0f})")
    return {"mpc_solves_per_s_H64": round(rate, 1), "mpc_batch": B}


def main():
    quick = "--quick" in sys.argv
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    from mujoco_rl_ur5_tpu.scene import load_model

    model = load_model(SCENE)
    extras = {}
    extras.update(bench_dynamics(model, quick))
    extras.update(bench_render(model, quick))
    mpc = bench_mpc(model, quick)
    if mpc:
        extras.update(mpc)
    try:
        extras.update(bench_env(model, quick))
    except Exception as e:  # env bench is the heaviest; don't lose the line
        log(f"env bench failed: {type(e).__name__}: {e}")

    if mpc:
        value = extras["mpc_solves_per_s_H64"]
        result = {
            "metric": "grasp_mpc_solves_per_s_chip_H64",
            "value": value,
            "unit": "solves/s",
            "vs_baseline": round(value / REALTIME_SOLVES_PER_S, 3),
            "extras": extras,
        }
    else:
        key = max((k for k in extras if k.startswith("dynamics")),
                  key=lambda k: extras[k])
        value = extras[key]
        result = {
            "metric": "contact_dynamics_steps_per_s",
            "value": value,
            "unit": "scenario-steps/s",
            # real-time factor: simulated seconds per wall second
            "vs_baseline": round(value * TIMESTEP, 1),
            "extras": extras,
        }
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
