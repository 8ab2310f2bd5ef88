"""utils/ — cross-cutting utilities (SURVEY.md §5, reference decorators.py).

  * `decorators` — timer/debug/typeassert/dict2list parity with
    /root/reference/decorators.py, plus TPU-aware variants (`block_timer`
    blocks on device results; `jax_trace` wraps jax.profiler).
  * `metrics`    — tensorboard writer with the reference's exact metric
    names (Grasping_Agent_multidiscrete.py:448-511) + console banners.
  * `config`     — dataclass config tree (scene, solver, env, train, mesh),
    replacing the reference's module-level UPPERCASE constants.
"""

from mujoco_rl_ur5_tpu.utils.decorators import (
    timer, debug, typeassert, dict2list, block_timer, jax_trace,
)
from mujoco_rl_ur5_tpu.utils.metrics import MetricsTracker
from mujoco_rl_ur5_tpu.utils.config import (
    SceneConfig, SolverConfig, EnvConfig, TrainConfig, MeshConfig, Config,
)

__all__ = [
    "timer", "debug", "typeassert", "dict2list", "block_timer", "jax_trace",
    "MetricsTracker", "SceneConfig", "SolverConfig", "EnvConfig",
    "TrainConfig", "MeshConfig", "Config",
]
