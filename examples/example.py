"""Controller API walkthrough — the TPU port of /root/reference/example.py.

Same sequence of primitives, executed as jitted fixed-horizon programs:
show model info, move above the object (with a trajectory plot), descend,
wait, grasp, lift, toss, settle. Runs headless on CPU or TPU.

Usage: PYTHONPATH=/root/repo python examples/example.py [--budget-scale S]
(S < 1 shrinks every motion's step budget for a quick smoke run.)
"""

import argparse
import os

if os.environ.get("FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import jax
import jax.numpy as jnp
import numpy as np

from mujoco_rl_ur5_tpu.control import (
    Controller, joint_angle_plot, show_model_info,
)
from mujoco_rl_ur5_tpu.scene import load_model, make_state

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger.xml"


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--budget-scale", type=float, default=1.0)
    p.add_argument("--scene", default=SCENE)
    args = p.parse_args()
    S = lambda n: max(2, int(round(n * args.budget_scale)))

    model = load_model(args.scene)
    controller = Controller(model, ncon=128)

    # Display robot information (MujocoController.show_model_info)
    show_model_info(model, controller)

    state = make_state(model)
    cstate = controller.init(qpos0=state.qpos)

    # Move ee above the object, recording the trajectory for the plot
    move = jax.jit(lambda s, c: controller.move_ee(
        s, c, jnp.asarray([0.0, -0.6, 0.95], jnp.float32),
        tolerance=0.05, max_steps=S(1000)))
    res = move(state, cstate)
    print(f"move_ee -> success={bool(res.success)} steps={int(res.steps)}")

    # plot a recorded Arm move (reference plot=True path)
    res2, traj = jax.jit(lambda s, c: controller.move_group(
        s, c, "Arm", None, tolerance=0.05, max_steps=S(200),
        record=True))(res.state, res.ctrl)
    joint_angle_plot(np.asarray(traj)[:, :5],
                     np.asarray(res2.ctrl.setpoints)[:5], 0.05,
                     joint_names=["shoulder_pan", "shoulder_lift", "elbow",
                                  "wrist_1", "wrist_2"],
                     filename="/tmp/example_trajectory.png")

    # Move down to the object
    res = jax.jit(lambda s, c: controller.move_ee(
        s, c, jnp.asarray([0.0, -0.6, 0.895], jnp.float32),
        tolerance=0.01, max_steps=S(300)))(res2.state, res2.ctrl)
    print(f"descend -> success={bool(res.success)}")

    # Wait a second
    res = jax.jit(lambda s, c: controller.stay(
        s, c, 1000.0 * args.budget_scale))(res.state, res.ctrl)

    # Attempt grasp (inverted convention: True = object blocks fingers)
    res_g = jax.jit(lambda s, c: controller.grasp(
        s, c, max_steps=S(300)))(res.state, res.ctrl)
    print(f"grasp -> object in gripper: {bool(res_g.success)}")

    # Move up again
    res = jax.jit(lambda s, c: controller.move_ee(
        s, c, jnp.asarray([0.0, -0.6, 1.0], jnp.float32),
        tolerance=0.05, max_steps=S(1000)))(res_g.state, res_g.ctrl)

    # Throw the object away
    res = jax.jit(lambda s, c: controller.toss_it_from_the_ellbow(
        s, c, settle_steps=S(2000)))(res.state, res.ctrl)
    print(f"toss -> settled={bool(res.success)}")

    # Wait before finishing
    res = jax.jit(lambda s, c: controller.stay(
        s, c, 2000.0 * args.budget_scale))(res.state, res.ctrl)
    assert np.isfinite(np.asarray(res.state.qpos)).all()
    print("Finished.")


if __name__ == "__main__":
    main()
