"""Multi-host pod-slice initialization + fault-tolerant run helpers.

The reference is strictly single-process (SURVEY.md §2.4: no
torch.distributed, no multiprocessing anywhere). This is the TPU-native
scale-out layer it never had:

  * `initialize_multihost` — `jax.distributed.initialize` wrapper with env
    autodetection (no-ops on a single host, so every entry point can call
    it unconditionally);
  * `global_mesh` — a {data, model} mesh over ALL processes' devices;
    collectives between data shards ride ICI within a slice and DCN across
    slices (GSPMD chooses the ring);
  * `sync_hosts` — barrier via a tiny psum, used around checkpoint writes;
  * `elastic_run` — restart-on-failure loop around a train function with
    orbax checkpoint resume, the failure-recovery behavior SURVEY §5 maps
    from the reference's try/except + fallback style to multi-host.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import numpy as np

from mujoco_rl_ur5_tpu.parallel.mesh import make_mesh


def initialize_multihost(coordinator: Optional[str] = None,
                         num_processes: Optional[int] = None,
                         process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed when running multi-process.

    Autodetects standard env vars (JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID, or TPU pod metadata handled by
    jax.distributed itself). Returns True when distributed mode is active.
    Single-host (no coordinator info anywhere): returns False without
    touching global state, so call sites need no branching."""
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    num_processes = num_processes or _int_env("JAX_NUM_PROCESSES")
    process_id = process_id if process_id is not None \
        else _int_env("JAX_PROCESS_ID")
    in_pod = os.environ.get("TPU_WORKER_HOSTNAMES") is not None
    if coordinator is None and not in_pod:
        return False
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id)
    return True


def _int_env(name: str) -> Optional[int]:
    v = os.environ.get(name)
    return int(v) if v is not None else None


def global_mesh(model: int = 1):
    """{data, model} mesh over every device of every process."""
    return make_mesh(jax.devices(), data=-1, model=model)


def sync_hosts(tag: str = "sync") -> None:
    """Cross-host barrier: a 1-element psum over all devices."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(tag)


def is_coordinator() -> bool:
    return jax.process_index() == 0


def elastic_run(train_fn: Callable[[Optional[str]], None],
                checkpoint_dir: str, max_restarts: int = 3,
                backoff_s: float = 5.0) -> None:
    """Restart-on-failure wrapper: run `train_fn(resume_path)`; on an
    exception, locate the newest checkpoint in `checkpoint_dir` and restart
    from it (up to `max_restarts`). Paired with the Trainer's orbax
    checkpoints this gives preemption/fault recovery the reference's flat
    for-loop (Grasping_Agent_multidiscrete.py:523-558) cannot."""
    attempt = 0
    while True:
        resume = _latest_checkpoint(checkpoint_dir)
        try:
            train_fn(resume)
            return
        except KeyboardInterrupt:
            raise
        except Exception as e:  # noqa: BLE001 -- restart on any failure
            attempt += 1
            if attempt > max_restarts:
                raise
            print(f"elastic_run: attempt {attempt} failed with "
                  f"{type(e).__name__}: {e}; restarting from "
                  f"{resume or 'scratch'} in {backoff_s}s")
            time.sleep(backoff_s)


def _latest_checkpoint(checkpoint_dir: str) -> Optional[str]:
    if not os.path.isdir(checkpoint_dir):
        return None
    entries = sorted(
        (e for e in os.listdir(checkpoint_dir)
         if os.path.isdir(os.path.join(checkpoint_dir, e))))
    return os.path.join(checkpoint_dir, entries[-1]) if entries else None
