"""Smoke/debug driver for MPCGraspPolicy.pick on the box scenario
(the test_grasp_parity robust-success case). CPU-friendly small horizon.

Usage: python scripts/mpc_pick_demo.py [horizon] [substeps]
"""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

# the axon TPU plugin overrides JAX_PLATFORMS; force CPU via jax.config
# (same pattern as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mujoco_rl_ur5_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from mujoco_rl_ur5_tpu.mpc import GraspMPC, MPCGraspPolicy
from mujoco_rl_ur5_tpu.scene import load_model, make_state
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_FREE
from mujoco_rl_ur5_tpu.scene.reduce import load_arm_model

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"
HOME = np.array([0, -1.57, 1.57, -1.57, -1.57, 0, 0.3, 0.3])


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 25
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    print(f"H={H} substeps={S} devices={jax.devices()}", file=sys.stderr)
    model = load_model(SCENE)
    arm = load_arm_model(SCENE)
    t = model.topo
    qpos = np.asarray(model.qpos0).copy()
    qpos[:8] = HOME
    free = np.nonzero(t.jnt_type == JNT_FREE)[0]
    for k, j in enumerate(free):
        qa = t.jnt_qposadr[j]
        qpos[qa:qa + 3] = [40 + 2 * k, 40, 5.0]
        qpos[qa + 3:qa + 7] = [1, 0, 0, 0]
    qa_box = t.jnt_qposadr[free[10]]
    qpos[qa_box:qa_box + 3] = [0.0, -0.60, 0.94]
    qpos[qa_box + 3:qa_box + 7] = [1, 0, 0, 0]

    mpc = GraspMPC(model, arm_model=arm, horizon=H, substeps=S,
                   use_pallas=False)
    pol = MPCGraspPolicy(model, mpc, ncon=64)
    state = make_state(model).replace(qpos=jnp.asarray(qpos, jnp.float32))
    # descend target = max(0.91, z-0.01); the firm-pinch depth for the box
    # is 0.92 (tests/test_grasp_parity.py::test_box_grasp_lifts_in_both_
    # engines), so aim the pick at z=0.93
    coords = jnp.asarray([0.0, -0.60, 0.93], jnp.float32)

    t0 = time.perf_counter()
    res = jax.block_until_ready(pol.pick(state, coords))
    print(f"pick: compile+run {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    z = float(res.state.qpos[qa_box + 2])
    print(f"grasped={bool(res.grasped)} ee_err={float(res.ee_err):.4f} "
          f"box_z={z:.4f} (lift gate 0.965)", file=sys.stderr)
    qg = np.asarray(res.state.qpos[pol.grip_qadr])
    print(f"finger q: {qg}", file=sys.stderr)


if __name__ == "__main__":
    main()
