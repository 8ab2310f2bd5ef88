"""Mesh + sharding utilities (GSPMD-first).

Design (per the scaling-book recipe): pick a mesh, annotate shardings on the
inputs, let XLA insert the collectives, profile, iterate. Two named axes:

  * "data"  — scenario/batch parallelism: env states, replay samples, and
    per-example gradients shard here; gradient sync is one `psum` riding ICI.
  * "model" — RESERVED (size 1 in every shipped configuration). Measured
    honestly: this workload has no tensor large enough for a model axis to
    pay for its collectives — the MPC's Riccati blocks are 16x16 (a single
    MXU tile; sharding them is pure communication), and the Q-net tops out
    at 512-channel convs whose feature-parallel all-gather only breaks even
    beyond batch sizes the replay pipeline never reaches. The axis exists so
    every sharding below stays valid on meshes with model > 1 (placement +
    loss parity are tested in tests/test_parallel.py) and so a future
    larger policy net can turn it on without touching call sites; the
    `tp_*` helpers below implement the conv layout for that case.

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
    over "data" (enforced via in_shardings, so placement does not silently
    depend on the caller). Physics, contacts, rendering, and the phase
    machine all run SPMD with zero collectives (scenarios are independent)."""
    stepped = jax.vmap(env.step)
    data = NamedSharding(mesh, P("data"))

    def step(es_batch, actions):
        return stepped(es_batch, actions)

    # P("data") shards each leaf's leading (scenario) axis and replicates the
    # rest; every EnvState/CtrlState leaf carries the batch axis first.
    return jax.jit(step, in_shardings=(data, data), out_shardings=data)


def dp_env_reset(env, mesh: Mesh):
    """Scenario-parallel reset: keys[B] sharded over "data"."""
    reset = jax.vmap(env.reset)
    data = NamedSharding(mesh, P("data"))
    return jax.jit(reset, in_shardings=(data,), out_shardings=data)


# -- tensor parallelism -------------------------------------------------------


def tp_param_shardings(mesh: Mesh, params, min_features: int = 128):
    """TP layout for the conv Q-net: shard the output-feature (minor-most)
    axis of every kernel with >= `min_features` output channels over
    "model"; replicate everything else. With NHWC activations replicated
    per data-shard, GSPMD turns each sharded conv into a feature-parallel
    matmul + all-gather on ICI — profitable once channel counts are large
    (512-ch blocks in the MULTIDISCRETE_RESNET encoder, learn/networks.py).

    Returns a pytree of NamedShardings matching `params`."""
    model_ax = mesh.shape["model"]

    def spec(x):
        if (hasattr(x, "ndim") and x.ndim >= 2
                and x.shape[-1] >= min_features
                and x.shape[-1] % model_ax == 0):
            return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
        return NamedSharding(mesh, P())

    return jax.tree.map(spec, params)


def tp_place_train_state(agent, mesh: Mesh, ts, min_features: int = 128):
    """Place a TrainState with TP-sharded params + matching opt state
    (everything else replicated). The returned state feeds the ordinary
    jitted `agent.train_step` — GSPMD propagates the layouts."""
    psh = tp_param_shardings(mesh, ts.params, min_features)
    repl = NamedSharding(mesh, P())

    def opt_put(x):
        if hasattr(x, "ndim"):
            return jax.device_put(x, _match_spec(mesh, x, min_features))
        return x

    return ts.replace(
        params=jax.device_put(ts.params, psh),
        batch_stats=jax.tree.map(
            lambda x: jax.device_put(x, repl), ts.batch_stats),
        opt_state=jax.tree.map(opt_put, ts.opt_state),
        step=jax.device_put(ts.step, repl),
        greedy_rotations=jax.device_put(ts.greedy_rotations, repl),
        greedy_successes=jax.device_put(ts.greedy_successes, repl),
        random_successes=jax.device_put(ts.random_successes, repl),
    )


def _match_spec(mesh: Mesh, x, min_features: int):
    """Sharding for one array using the TP kernel rule (helper for opt
    state leaves, which mirror param shapes)."""
    model_ax = mesh.shape["model"]
    if (x.ndim >= 2 and x.shape[-1] >= min_features
            and x.shape[-1] % model_ax == 0):
        return NamedSharding(mesh, P(*([None] * (x.ndim - 1) + ["model"])))
    return NamedSharding(mesh, P())
