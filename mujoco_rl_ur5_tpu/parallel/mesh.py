"""Mesh + sharding utilities (GSPMD-first).

Design (per the scaling-book recipe): pick a mesh, annotate shardings on the
inputs, let XLA insert the collectives, profile, iterate. Two named axes:

  * "data"  — scenario/batch parallelism: env states, replay samples, and
    per-example gradients shard here; gradient sync is one `psum` riding ICI.
  * "model" — reserved for tensor parallelism of the conv channels / Riccati
    block factorizations; size 1 on small slices so every sharding below is
    valid from 1 chip to a pod slice without code changes.

Everything is `jax.jit` + `NamedSharding` (GSPMD), not hand-written pmaps:
XLA chooses all-reduce implementations (bidirectional ring over ICI) better
than a hand scheduler, and the same program runs single-chip (mesh 1x1),
multi-chip, and multi-host (`jax.distributed.initialize` + the same code).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, data: int = -1,
              model: int = 1) -> Mesh:
    """Build a {data, model} mesh. data=-1 absorbs all remaining devices."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        assert n % model == 0, (n, model)
        data = n // model
    grid = np.asarray(devices).reshape(data, model)
    return Mesh(grid, axis_names=("data", "model"))


def shard_batch(mesh: Mesh, tree, axis: int = 0):
    """Place a pytree with its leading axis sharded over the data axis."""
    def put(x):
        spec = [None] * jnp.ndim(x)
        if jnp.ndim(x) > 0:
            spec[axis] = "data"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree.map(put, tree)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree over the mesh (params, opt state)."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)


def dp_train_step(agent, mesh: Mesh):
    """Data-parallel learner step: batch sharded over "data", params
    replicated; the gradient all-reduce is inserted by GSPMD (it shows up as
    one fused psum over ICI in the profile). Returns a jitted fn
    (ts, states, actions, rewards) -> (ts, loss)."""
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

    def step(ts, states, actions, rewards):
        return agent.train_step(ts, states, actions, rewards)

    return jax.jit(
        step,
        in_shardings=(repl, NamedSharding(mesh, P("data", None, None, None)),
                      batch_sh, batch_sh),
        out_shardings=(repl, repl),
    )


def dp_env_rollout(env, mesh: Mesh):
    """Scenario-parallel env step: vmap over the batch, batch axis sharded
    over "data". Physics, contacts, rendering, and the phase machine all run
    SPMD with zero collectives (scenarios are independent)."""
    stepped = jax.vmap(env.step)

    def step(es_batch, actions):
        return stepped(es_batch, actions)

    return jax.jit(step)
