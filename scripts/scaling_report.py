"""Scaling-efficiency report (BASELINE.md: solves/s efficiency at 1 chip /
1 host / N hosts).

With one physical chip available, this script measures STRONG/WEAK scaling
shape on an N-virtual-device CPU mesh (the same GSPMD programs that run on
a pod slice — `jax.distributed` + the identical code path covers multi-host)
and absolute single-chip numbers come from bench.py. Prints one JSON line:
per-device-count throughput + parallel efficiency for (a) the DP learner
step and (b) the scenario-sharded env rollout.

Usage:
    python scripts/scaling_report.py [--devices 8] [--image 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--image", type=int, default=32)
    p.add_argument("--batch-per-device", type=int, default=4)
    p.add_argument("--env-steps", action="store_true",
                   help="also scale the (slow-compiling) env rollout")
    p.add_argument("--mpc", action="store_true",
                   help="also scale the batched grasp-MPC solve (the "
                        "north-star metric's mesh-sharded form)")
    args = p.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count"
                                 f"={args.devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from mujoco_rl_ur5_tpu.learn import AgentConfig, GraspAgent
    from mujoco_rl_ur5_tpu.parallel import dp_train_step, make_mesh

    def timed(fn, *xs, iters=5):
        fn(*xs)
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            jax.block_until_ready(fn(*xs))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts))

    counts = [d for d in (1, 2, 4, 8) if d <= args.devices]
    # NOTE on reading the numbers: the N "devices" are virtual shards of ONE
    # physical CPU, so under weak scaling (B = per_dev * d) the zero-overhead
    # ideal is CONSTANT throughput, i.e. efficiency = 1/d. We report both
    # `efficiency` (rate / (base * d), the real-mesh convention) and
    # `vs_shared_silicon` (rate / base): the latter is 1.0 when GSPMD
    # sharding adds no overhead on shared silicon.
    report = {"learner": {}, "env": {}, "mpc": {},
              "note": ("virtual shared-silicon mesh: ideal weak-scaling "
                       "efficiency is 1/d; vs_shared_silicon=1.0 means "
                       "zero sharding overhead")}
    im = args.image

    agent = GraspAgent(AgentConfig(width=im, height=im, memory_size=32,
                                   batch_size=8, dtype="float32"), seed=0)
    base_rate = None
    for d in counts:
        mesh = make_mesh(jax.devices()[:d], data=d, model=1)
        B = args.batch_per_device * d          # weak scaling
        step = dp_train_step(agent, mesh)
        ts = agent.init(jax.random.PRNGKey(0))
        states = jax.random.uniform(jax.random.PRNGKey(1), (B, im, im, 4))
        actions = jnp.arange(B, dtype=jnp.int32)
        rewards = jnp.ones((B,), jnp.float32)
        dt = timed(lambda t, s, a, r: step(t, s, a, r)[1],
                   ts, states, actions, rewards)
        rate = B / dt
        if base_rate is None:
            base_rate = rate / d * d           # per-1-device baseline
            base_per_dev = rate
        eff = rate / (base_per_dev * d)
        report["learner"][d] = {"examples_per_s": round(rate, 1),
                                "efficiency": round(eff, 3),
                                "vs_shared_silicon": round(eff * d, 3)}
        print(f"learner d={d}: {rate:,.1f} ex/s  eff={eff:.2f}",
              file=sys.stderr)

    if args.mpc:
        from mujoco_rl_ur5_tpu.mpc import GraspMPC
        from mujoco_rl_ur5_tpu.parallel import make_mesh as mk, shard_batch

        # small solve config: the CPU mesh measures SCALING SHAPE; absolute
        # chip numbers come from bench.py
        mpc = GraspMPC.from_scene(
            "/root/reference/UR5+gripper/"
            "UR5gripper_2_finger_many_objects.xml",
            horizon=8, substeps=4, iters=3, use_pallas=False)
        base = None
        for d in counts:
            mesh = mk(jax.devices()[:d], data=d, model=1)
            B = args.batch_per_device * d          # weak scaling
            x0 = jnp.tile(jnp.concatenate(
                [jnp.asarray(mpc.home, jnp.float32),
                 jnp.zeros(mpc.nq, jnp.float32)]), (B, 1))
            tg = jnp.tile(jnp.asarray([0.0, -0.6, 1.0], jnp.float32),
                          (B, 1))
            x0s, tgs = shard_batch(mesh, x0), shard_batch(mesh, tg)
            dt = timed(lambda a, b: mpc.solve_batch_x(a, b).cost,
                       x0s, tgs, iters=3)
            rate = B / dt
            if base is None:
                base = rate
            eff = rate / (base * d)
            report["mpc"][d] = {"solves_per_s": round(rate, 2),
                                "efficiency": round(eff, 3),
                                "vs_shared_silicon": round(eff * d, 3)}
            print(f"mpc d={d}: {rate:,.2f} solves/s eff={eff:.2f}",
                  file=sys.stderr)

    if args.env_steps:
        from mujoco_rl_ur5_tpu.env import GraspEnv
        from mujoco_rl_ur5_tpu.parallel import dp_env_reset
        from mujoco_rl_ur5_tpu.scene import load_model

        model = load_model("/root/reference/UR5+gripper/"
                           "UR5gripper_2_finger_many_objects.xml")
        env = GraspEnv(model, ncon=48, iterations=4, image_width=16,
                       image_height=16, budget_scale=0.003)
        base = None
        for d in counts:
            mesh = make_mesh(jax.devices()[:d], data=d, model=1)
            B = args.batch_per_device * d
            reset = dp_env_reset(env, mesh)
            keys = jax.random.split(jax.random.PRNGKey(0), B)
            dt = timed(lambda k: reset(k), keys, iters=3)
            rate = B / dt
            if base is None:
                base = rate
            eff = rate / (base * d)
            report["env"][d] = {"resets_per_s": round(rate, 2),
                                "efficiency": round(eff, 3),
                                "vs_shared_silicon": round(eff * d, 3)}
            print(f"env d={d}: {rate:,.2f} resets/s eff={eff:.2f}",
                  file=sys.stderr)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
