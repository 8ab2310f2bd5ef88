"""Online training loop: the runnable entry point the framework exists for.

Reproduces `Grasping_Agent_multidiscrete.main()` (:515-583): for each
episode, reset the env, then for each step run
eps_greedy -> env.step (one full scripted pick-&-place) -> tensorboard ->
replay.push -> learn, checkpointing at episode boundaries (:560-572).

TPU re-design: the loop drives `batch_envs` scenarios in LOCKSTEP — reset,
action selection, the ~6k-step phase machine, and the observation transform
are all vmapped, so one device program advances every scenario and each env
step banks `batch_envs` transitions (the reference is strictly 1 env,
SURVEY.md §2.4). Host work is only action readback for the skip-gate-free
replay push and the metrics writer.

Resume restores {params, opt_state, step, counters, replay ring, PRNG key}
via orbax — strictly more than the reference's checkpoint dict (:560-572),
which drops the replay buffer and RNG state.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_rl_ur5_tpu.env import GraspEnv
from mujoco_rl_ur5_tpu.learn.agent import AgentConfig, GraspAgent
from mujoco_rl_ur5_tpu.scene import load_model
from mujoco_rl_ur5_tpu.utils.config import Config
from mujoco_rl_ur5_tpu.utils.metrics import MetricsTracker


class Trainer:
    """Owns env + agent + replay + metrics; `run()` is the main loop."""

    def __init__(self, config: Config = Config(), mesh=None):
        self.cfg = config
        self.model = load_model(config.scene.path)
        e, s = config.env, config.solver
        self.env = GraspEnv(self.model, ncon=s.ncon, iterations=s.iterations,
                            image_width=e.image_width,
                            image_height=e.image_height, camera=e.camera,
                            demo=e.demo, budget_scale=e.budget_scale)
        acfg = AgentConfig.for_env(
            self.env,
            **{k: getattr(config.agent, k) for k in (
                "rotations", "memory_size", "batch_size", "accum_steps",
                "gamma", "learning_rate", "weight_decay", "eps_start",
                "eps_end", "eps_decay", "depth_only", "normalization",
                "noise_sigma", "dtype")})
        self.agent = GraspAgent(acfg, seed=config.train.seed)
        t = config.train
        self.tracker = MetricsTracker(
            logdir=t.logdir,
            run_name=MetricsTracker.run_name(acfg, t.seed, t.description),
            rotations=acfg.rotations)
        self.B = t.batch_envs

        # jitted batched stages (compile once, reuse every episode)
        self._reset = jax.jit(jax.vmap(self.env.reset))
        self._step = jax.jit(jax.vmap(self.env.step))
        self._transform = jax.jit(jax.vmap(
            self.agent.transform_observation, in_axes=(0, 0, 0)))
        self._act = jax.jit(jax.vmap(
            self.agent.epsilon_greedy, in_axes=(None, 0, 0, 0)))

        if mesh is not None and self.B > 1:
            from mujoco_rl_ur5_tpu.parallel import (
                dp_env_reset, dp_env_rollout)

            self._reset = dp_env_reset(self.env, mesh)
            self._step = dp_env_rollout(self.env, mesh)

    # -- one episode -----------------------------------------------------------

    def run_episode(self, ts, buf, key, episode: int, steps: int,
                    verbose: bool = True):
        """Returns (ts, buf, key, rewards_per_step)."""
        agent, env, B = self.agent, self.env, self.B
        key, kreset = jax.random.split(key)
        es = self._reset(jax.random.split(kreset, B))
        rewards_hist = []
        for step_i in range(steps):
            key, kobs, kact, klearn = jax.random.split(key, 4)
            obs = self._transform(es.rgb, es.depth,
                                  jax.random.split(kobs, B))
            flat, was_greedy = self._act(ts, obs, es.depth,
                                         jax.random.split(kact, B))
            actions = jax.vmap(agent.transform_action)(flat)
            es, rewards, done, info = self._step(es, actions)

            # bank transitions + counters (push is batched)
            buf = agent.memory.push(buf, obs, flat, rewards)
            for b in range(B):
                ts = agent.record_action(ts, flat[b], rewards[b],
                                         was_greedy[b])
            ts, loss = agent.learn(ts, buf, klearn)

            # host-side metrics
            r_np = np.asarray(rewards)
            rot_np = np.asarray(flat) // (agent.cfg.height * agent.cfg.width)
            eps = agent.epsilon(ts)
            lf = None if loss is None else float(loss)
            for b in range(B):
                self.tracker.step(int(ts.step) - (B - 1 - b), float(r_np[b]),
                                  int(rot_np[b]), eps, loss=lf,
                                  counters={
                                      "greedy_rotations":
                                          np.asarray(ts.greedy_rotations),
                                      "greedy_successes":
                                          np.asarray(ts.greedy_successes),
                                      "random_successes":
                                          np.asarray(ts.random_successes)})
            if verbose:
                self.tracker.step_banner(int(ts.step), r_np,
                                         np.asarray(info["grasped"]))
            rewards_hist.append(r_np)
        return ts, buf, key, rewards_hist

    # -- full run ----------------------------------------------------------------

    def run(self, episodes: int | None = None,
            steps_per_episode: int | None = None, resume: str | None = None,
            verbose: bool = True):
        t = self.cfg.train
        episodes = t.episodes if episodes is None else episodes
        steps = (t.steps_per_episode if steps_per_episode is None
                 else steps_per_episode)
        agent = self.agent
        key = jax.random.PRNGKey(t.seed)
        ts = agent.init(jax.random.PRNGKey(t.seed))
        buf = agent.memory.init()
        if resume:
            ts, buf = agent.restore(resume, ts, buf)
            print(f"resumed from {resume} at step {int(ts.step)}")

        for ep in range(1, episodes + 1):
            if verbose:
                self.tracker.episode_banner(ep, episodes)
            t0 = time.perf_counter()
            ts, buf, key, _ = self.run_episode(ts, buf, key, ep, steps,
                                               verbose=verbose)
            if verbose:
                print(f"episode {ep}: {steps} steps x {self.B} envs in "
                      f"{time.perf_counter() - t0:.1f}s "
                      f"(eps={agent.epsilon(ts):.3f})")
            if t.checkpoint_dir and ep % t.save_every_episodes == 0:
                path = os.path.join(os.path.abspath(t.checkpoint_dir),
                                    f"ep{ep:05d}")
                agent.save(path, ts, buf)
                if verbose:
                    print(f"checkpoint saved: {path}")
        if t.checkpoint_dir:
            path = os.path.join(os.path.abspath(t.checkpoint_dir), "final")
            agent.save(path, ts, buf)
        self.tracker.close()
        return ts, buf


def main(argv=None):
    """CLI: python -m mujoco_rl_ur5_tpu.learn.train [--episodes N] ..."""
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--episodes", type=int, default=1000)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch-envs", type=int, default=1)
    p.add_argument("--seed", type=int, default=20)
    p.add_argument("--logdir", default="runs")
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--resume", default=None)
    p.add_argument("--image", type=int, default=200)
    p.add_argument("--budget-scale", type=float, default=1.0)
    a = p.parse_args(argv)

    import dataclasses

    cfg = Config()
    cfg = cfg.replace(
        env=dataclasses.replace(cfg.env, image_width=a.image,
                                image_height=a.image,
                                budget_scale=a.budget_scale),
        train=dataclasses.replace(cfg.train, episodes=a.episodes,
                                  steps_per_episode=a.steps,
                                  batch_envs=a.batch_envs, seed=a.seed,
                                  logdir=a.logdir,
                                  checkpoint_dir=a.checkpoint_dir))
    Trainer(cfg).run(resume=a.resume)


if __name__ == "__main__":
    main()
