"""Device-mesh parallelism: shardings + collectives for pod-slice scale-out.

The reference is strictly 1 process x 1 env x 1 GPU (SURVEY.md §2.4); this
package is the TPU-native scale-out layer it never had: a {data, model} mesh,
batch sharding for 4096-wide scenario rollouts, and psum-synchronized
data-parallel learning.
"""

from mujoco_rl_ur5_tpu.parallel.mesh import (
    make_mesh, shard_batch, replicate, dp_train_step, dp_env_rollout,
    dp_env_reset, tp_param_shardings, tp_place_train_state,
)
from mujoco_rl_ur5_tpu.parallel.distributed import initialize_multihost

__all__ = ["make_mesh", "shard_batch", "replicate", "dp_train_step",
           "dp_env_rollout", "dp_env_reset", "tp_param_shardings",
           "tp_place_train_state", "initialize_multihost"]
