"""Observation normalization statistics.

Capability parity with normalize.py (reference): sample N domain-randomized
env resets, compute per-channel (R, G, B, D) mean/std, persist them; the
agent reloads them for "standardize" mode (Grasping_Agent_multidiscrete.py:
370-379). Reference stored values: means ~ [108.30, 120.33, 132.30, 1.532],
stds ~ [67.87, 57.16, 48.94, 0.427] (`mean_and_std` pickle).

TPU re-design: the reference loops 100 serial resets on the host (~minutes);
here the resets are one vmapped, jitted batch — all N piles settle in
parallel on device and the moment statistics come back as two (4,) arrays.
Persisted as .npz (portable, no pickle security issues).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def compute_mean_std(env, key: jax.Array, n_samples: int = 100):
    """Returns (means (4,), stds (4,)) over n_samples randomized resets."""
    keys = jax.random.split(key, n_samples)
    es = jax.jit(jax.vmap(env.reset))(keys)
    rgb = es.rgb.astype(jnp.float32)                 # (N, H, W, 3)
    depth = es.depth.astype(jnp.float32)[..., None]  # (N, H, W, 1)
    obs = jnp.concatenate([rgb, depth], axis=-1)
    means = obs.mean(axis=(0, 1, 2))
    stds = obs.std(axis=(0, 1, 2))
    return np.asarray(means), np.asarray(stds)


def save_mean_std(path: str, means, stds):
    np.savez(path, means=np.asarray(means), stds=np.asarray(stds))


def load_mean_std(path: str):
    d = np.load(path)
    return d["means"], d["stds"]
