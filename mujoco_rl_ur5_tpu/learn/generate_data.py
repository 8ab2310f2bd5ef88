"""Offline data-generation driver: run a (optionally pretrained) agent in
the batched env and bank (state, action, reward) transitions into shard
files — the TPU port of Offline RL/generate_data.py (:14-132).

Reference behavior reproduced: same episode/step loop as online training
(:29-79) but transitions go to `ShardWriter` (FILE_SIZE=12 `.npz` shards,
:80-94) instead of the replay buffer and no learning happens; a checkpoint
path restores a trained policy first (:24-28); eps controls the
greedy/random mix (the reference reuses the decayed eps of the restored
step).

TPU design: `batch_envs` scenarios run in lockstep, so every env step banks
a whole batch of transitions — generating the reference's 16,968-transition
dataset takes ~17 steps at B=1024 instead of ~17k serial episodes.
"""

from __future__ import annotations

import jax
import numpy as np

from mujoco_rl_ur5_tpu.learn.offline import ShardWriter
from mujoco_rl_ur5_tpu.learn.train import Trainer
from mujoco_rl_ur5_tpu.utils.config import Config


def generate(config: Config = Config(), out_dir: str = "Data",
             episodes: int = 10, steps_per_episode: int = 50,
             checkpoint: str | None = None, file_size: int = 12,
             verbose: bool = True):
    """Returns (n_transitions, n_files, positives)."""
    tr = Trainer(config)
    agent, B = tr.agent, tr.B
    ts = agent.init(jax.random.PRNGKey(config.train.seed))
    buf = agent.memory.init()
    if checkpoint:
        ts, buf = agent.restore(checkpoint, ts, buf)
        if verbose:
            print(f"policy restored from {checkpoint} "
                  f"(step {int(ts.step)}, eps {agent.epsilon(ts):.3f})")

    writer = ShardWriter(out_dir, file_size=file_size)
    key = jax.random.PRNGKey(config.train.seed + 1)
    total = positives = 0
    for ep in range(1, episodes + 1):
        key, kreset = jax.random.split(key)
        es = tr._reset(jax.random.split(kreset, B))
        for _ in range(steps_per_episode):
            key, kobs, kact = jax.random.split(key, 3)
            obs = tr._transform(es.rgb, es.depth, jax.random.split(kobs, B))
            flat, was_greedy = tr._act(ts, obs, es.depth,
                                       jax.random.split(kact, B))
            actions = jax.vmap(agent.transform_action)(flat)
            es, rewards, _, info = tr._step(es, actions)
            # bank the NETWORK INPUT like the reference (it stores the
            # transformed observation, generate_data.py:60-76)
            writer.push(np.asarray(obs), np.asarray(flat),
                        np.asarray(rewards))
            # step counter advances so the restored eps keeps decaying
            for b in range(B):
                ts = agent.record_action(ts, flat[b], rewards[b],
                                         was_greedy[b])
            r = np.asarray(rewards)
            total += len(r)
            positives += int((r > 0.5).sum())
        if verbose:
            print(f"episode {ep}/{episodes}: {total} transitions banked "
                  f"({positives} positive), {writer.n_files} shards")
    return total, writer.n_files, positives


def main(argv=None):
    import argparse
    import dataclasses

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--out-dir", default="Data")
    p.add_argument("--episodes", type=int, default=10)
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--batch-envs", type=int, default=8)
    p.add_argument("--checkpoint", default=None)
    p.add_argument("--image", type=int, default=200)
    p.add_argument("--budget-scale", type=float, default=1.0)
    a = p.parse_args(argv)

    cfg = Config()
    cfg = cfg.replace(
        env=dataclasses.replace(cfg.env, image_width=a.image,
                                image_height=a.image,
                                budget_scale=a.budget_scale),
        train=dataclasses.replace(cfg.train, batch_envs=a.batch_envs))
    generate(cfg, out_dir=a.out_dir, episodes=a.episodes,
             steps_per_episode=a.steps, checkpoint=a.checkpoint)


if __name__ == "__main__":
    main()
