"""Headline TPU benchmark for mujoco_rl_ur5_tpu.

Run on the real chip (no platform forcing). Prints ONE JSON line on stdout:

    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extras": {...}}

Headline metric: grasp-MPC solves/s/chip at H=64 (BASELINE.md build target:
4096 parallel solves at H=64 in REAL TIME, i.e. 4096 solves per
64 * 2 ms = 0.128 s -> 32,000 solves/s == vs_baseline 1.0).

Robustness rules (learned from the BENCH_r02 failure, where a single
~100 s device call through the axon tunnel died with a device error):
  * every device call is kept SHORT — rolls are chunked host-side;
  * every section is wrapped in try/except; a failed section degrades the
    extras, never the JSON line;
  * batch sizes escalate adaptively: a bigger batch only runs if the
    projected call time stays under a budget.

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

from mujoco_rl_ur5_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"
TIMESTEP = 0.002
REALTIME_SOLVES_PER_S = 4096.0 / (64 * TIMESTEP)   # 32,000 (BASELINE target)
CALL_BUDGET_S = 45.0       # max projected seconds per single device call


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


def section(name, fn, extras, *args, **kw):
    try:
        out = fn(*args, **kw)
        if out:
            extras.update(out)
        return out
    except Exception as e:
        log(f"{name} FAILED: {type(e).__name__}: {e}")
        extras[f"{name}_error"] = f"{type(e).__name__}: {e}"[:200]
        return None


def bench_dynamics(model, quick: bool):
    """Batched contact step throughput: scenario-steps/s at escalating B.

    Each jitted roll covers K steps (a few seconds of device time); timing
    loops the call host-side, so no single device call grows with B."""
    from mujoco_rl_ur5_tpu.physics import dynamics
    from mujoco_rl_ur5_tpu.scene import make_state

    K = 25
    out = {}
    last_rate = None
    for B in ([256] if quick else [256, 1024, 4096]):
        if last_rate is not None:
            projected = B * K / last_rate
            if projected > CALL_BUDGET_S:
                log(f"dynamics B={B}: skipped (projected {projected:.0f}s "
                    f"per call > {CALL_BUDGET_S}s budget)")
                break
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
        dt = timed(lambda s: jax.block_until_ready(roll(s)), state,
                   iters=2 if B >= 4096 else 3)
        rate = B * K / dt
        last_rate = rate
        out[f"dynamics_steps_per_s_B{B}"] = round(rate)
        log(f"dynamics B={B}: {rate:,.0f} scenario-steps/s "
            f"(= {rate*TIMESTEP:,.1f}x real-time)")
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
    """Full GraspEnv: batched reset (settle) + one full scripted
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
    """North-star metric: batched grasp-MPC solves/s at H=64.

    Escalates B 256 -> 1024 -> 4096, only continuing while the projected
    single-call time stays under budget; reports the best solves/s and the
    B achieving it."""
    from mujoco_rl_ur5_tpu.mpc import GraspMPC
    from mujoco_rl_ur5_tpu.scene import make_state

    H = 64
    mpc = GraspMPC.from_scene(SCENE, horizon=H)
    best_rate, best_B = 0.0, 0
    last_rate = None
    out = {}
    for B in ([256] if quick else [256, 1024, 4096]):
        if last_rate is not None and B / last_rate > CALL_BUDGET_S:
            log(f"mpc B={B}: skipped (projected {B/last_rate:.0f}s "
                f"> {CALL_BUDGET_S}s budget)")
            break
        state = make_state(model, (B,))
        targets = jnp.tile(jnp.asarray([0.0, -0.6, 1.0]), (B, 1))
        solve = jax.jit(mpc.solve_batch)
        t0 = time.perf_counter()
        jax.block_until_ready(solve(state, targets))
        log(f"mpc B={B} H={H}: compile+1st run {time.perf_counter()-t0:.1f}s")
        dt = timed(lambda s, t: jax.block_until_ready(solve(s, t)),
                   state, targets, iters=2 if B >= 4096 else 3)
        rate = B / dt
        last_rate = rate
        log(f"mpc B={B}: {rate:,.0f} solves/s "
            f"(target {REALTIME_SOLVES_PER_S:,.0f})")
        out[f"mpc_solves_per_s_B{B}"] = round(rate, 1)
        if rate > best_rate:
            best_rate, best_B = rate, B
    if best_B == 0:
        return None
    out.update({"mpc_solves_per_s_H64": round(best_rate, 1),
                "mpc_batch": best_B})
    return out


def main():
    quick = "--quick" in sys.argv
    log(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    from mujoco_rl_ur5_tpu.scene import load_model

    t0 = time.perf_counter()
    model = load_model(SCENE)
    log(f"load_model: {time.perf_counter()-t0:.1f}s")
    extras = {}
    mpc = section("mpc", bench_mpc, extras, model, quick)
    section("dynamics", bench_dynamics, extras, model, quick)
    section("render", bench_render, extras, model, quick)
    section("env", bench_env, extras, model, quick)

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
        dyn = {k: v for k, v in extras.items() if k.startswith("dynamics_")}
        if dyn:
            key = max(dyn, key=lambda k: dyn[k])
            value = extras[key]
            result = {
                "metric": "contact_dynamics_steps_per_s",
                "value": value,
                "unit": "scenario-steps/s",
                # real-time factor: simulated seconds per wall second
                "vs_baseline": round(value * TIMESTEP, 1),
                "extras": extras,
            }
        else:
            result = {"metric": "bench_failed", "value": 0, "unit": "",
                      "vs_baseline": 0.0, "extras": extras}
    print(json.dumps(result), flush=True)


if __name__ == "__main__":
    main()
