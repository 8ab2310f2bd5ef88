"""Scene layer: MJCF parsing and compilation to frozen device pytrees."""

from mujoco_rl_ur5_tpu.scene.compile import compile_spec, load_model  # noqa: F401
from mujoco_rl_ur5_tpu.scene.model import Model, State, Topology, make_state  # noqa: F401
