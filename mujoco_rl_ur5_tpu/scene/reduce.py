"""Model reduction: compile an arm-only submodel from a grasp scene.

The grasp scenes couple one actuated arm+gripper kinematic tree with 40
free-floating object trees (UR5+gripper/objects.xml). The MPC engine plans
over the *arm subsystem only* — exactly like the reference's planner layer
(ikpy IK + PID, gym_grasper/controller/MujocoController.py:446-517) which
also ignores the objects at planning time. Planning state is then
(qpos, qvel) of the 8 hinge dofs -> tiny Riccati blocks instead of a
494-dim state, which is the difference between an MXU-friendly 16x16
backward pass and an intractable one.

Reduction happens at the *spec* level: drop every top-level body owning a
free joint, then run the ordinary compiler. All derived tables (trees, dof
layout, hulls, contact pairs) stay consistent by construction.
"""

from __future__ import annotations

import copy

from mujoco_rl_ur5_tpu.scene import mjcf
from mujoco_rl_ur5_tpu.scene.compile import compile_spec
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_FREE, SceneSpec
from mujoco_rl_ur5_tpu.scene.model import Model


def drop_free_bodies(spec: SceneSpec) -> SceneSpec:
    """Return a copy of the spec without free-joint (pile-object) bodies."""
    out = copy.copy(spec)
    wb = copy.copy(spec.worldbody)
    wb.bodies = [b for b in spec.worldbody.bodies
                 if not any(j.type == JNT_FREE for j in b.joints)]
    out.worldbody = wb
    return out


def load_arm_model(path: str, dtype=None) -> Model:
    """Parse + compile the arm-only submodel of a grasp scene MJCF
    (disk-cached, see scene/compile.py cached_compile)."""
    import numpy as np

    from mujoco_rl_ur5_tpu.scene.compile import cached_compile

    dtype = dtype or np.float32
    return cached_compile(
        path, dtype, "arm",
        lambda: compile_spec(drop_free_bodies(mjcf.parse_mjcf(path)),
                             dtype=dtype))
