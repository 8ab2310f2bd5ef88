"""Model/state introspection + trajectory plotting (host-side diagnostics).

Capability parity with the reference's console/plot surface:
  * `show_model_info`        — bodies, joints+limits, actuators+ranges,
                               kinematic chain, PID gains, cameras
                               (MujocoController.py:79-134);
  * `display_current_values` — current qpos/qvel/setpoints per actuated
                               joint + body poses (:540-602);
  * `joint_angle_plot`       — per-joint trajectory subplots with target
                               and +-tolerance bands, saved to PNG
                               (:639-706 fill_plot_list /
                               create_joint_angle_plot).

All functions are pure host-side printing/plotting over the compiled Model
and (optionally) a State snapshot — nothing here touches the jitted paths.
"""

from __future__ import annotations

import numpy as np

from mujoco_rl_ur5_tpu.scene.model import Model, State

_PLOT_COUNTER = [0]


def show_model_info(model: Model, controller=None) -> None:
    """Print bodies, joints, actuators, chain, PID, cameras
    (MujocoController.py:79-134)."""
    t = model.topo
    print(f"\nNumber of bodies: {t.nbody}")
    for i, name in enumerate(t.body_names):
        print(f"Body ID: {i}, Body Name: {name}")

    print(f"\nNumber of joints: {t.njnt}")
    jr = np.asarray(model.jnt_range)
    for i, name in enumerate(t.joint_names):
        lim = jr[i] if t.jnt_limited[i] else "unlimited"
        print(f"Joint ID: {i}, Joint Name: {name}, Limits: {lim}")

    print(f"\nNumber of Actuators: {t.nu}")
    cr = np.asarray(model.act_ctrlrange)
    for i in range(t.nu):
        jname = t.joint_names[int(t.act_jnt[i])]
        print(f"Actuator ID: {i}, Controlled Joint: {jname}, "
              f"Control Range: {cr[i]}")

    if controller is not None:
        print("\nJoints in kinematic chain: "
              f"{[t.body_names[b] for b in controller.chain.bodies]}")
        print("\nPID Info: \n")
        # gains live in CtrlState.params at runtime; print the defaults
        from mujoco_rl_ur5_tpu.control.pid import reference_gains

        g = reference_gains()
        for i in range(min(t.nu, g.kp.shape[0])):
            jname = t.joint_names[int(t.act_jnt[i])]
            print(f"{jname}: P: {float(g.kp[i])}, I: {float(g.ki[i])}, "
                  f"D: {float(g.kd[i])}, output limits: "
                  f"({float(g.out_lo[i])}, {float(g.out_hi[i])})")

    print("\nCamera Info: \n")
    fovy = np.asarray(model.cam_fovy)
    cpos = np.asarray(model.cam_pos)
    for i, name in enumerate(t.cam_names):
        print(f"Camera ID: {i}, Camera Name: {name}, "
              f"Camera FOV (y, degrees): {fovy[i]}, Position: {cpos[i]}")


def display_current_values(model: Model, state: State,
                           cstate=None) -> None:
    """Print the current joint positions/velocities (and PID setpoints when
    a CtrlState is given) — MujocoController.py:540-602."""
    t = model.topo
    qpos = np.asarray(state.qpos)
    qvel = np.asarray(state.qvel)
    print("\n################################################")
    print("CURRENT JOINT POSITIONS (ACTUATED)")
    print("################################################")
    for i in range(t.nu):
        j = int(t.act_jnt[i])
        print(f"Current angle for joint {t.joint_names[j]}: "
              f"{qpos[t.jnt_qposadr[j]]}")
    print("\n################################################")
    print("CURRENT JOINT VELOCITIES (ACTUATED)")
    print("################################################")
    for i in range(t.nu):
        j = int(t.act_jnt[i])
        print(f"Current velocity for joint {t.joint_names[j]}: "
              f"{qvel[t.jnt_dofadr[j]]}")
    if cstate is not None:
        print("\n################################################")
        print("CURRENT PID SETPOINTS")
        print("################################################")
        sp = np.asarray(cstate.setpoints)
        for i in range(t.nu):
            j = int(t.act_jnt[i])
            print(f"Setpoint for joint {t.joint_names[j]}: {sp[..., i]}")


def joint_angle_plot(traj: np.ndarray, setpoints: np.ndarray,
                     tolerance: float, joint_names=None,
                     filename: str | None = None) -> str:
    """Save per-joint trajectory subplots with green target and red
    +-tolerance bands (MujocoController.py:639-706). ``traj`` is (T, n)
    joint angles (from Controller's record option), ``setpoints`` (n,)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    traj = np.asarray(traj)
    setpoints = np.asarray(setpoints)
    T, n = traj.shape
    if joint_names is None:
        joint_names = [f"joint_{i}" for i in range(n)]
    cols = 3
    rows = -(-n // cols)
    fig = plt.figure(1, figsize=(15, 10))
    plt.subplots_adjust(hspace=0.4, left=0.05, right=0.95, top=0.95,
                        bottom=0.05)
    steps = np.arange(T)
    for i in range(n):
        ax = fig.add_subplot(rows, cols, i + 1)
        ax.plot(steps, traj[:, i])
        ax.set_title(joint_names[i])
        ax.set_xlabel("Steps")
        ax.set_ylabel("Joint angle [rad]")
        ax.axhline(setpoints[i], color="g", linestyle="--")
        ax.axhline(setpoints[i] + tolerance, color="r", linestyle="--")
        ax.axhline(setpoints[i] - tolerance, color="r", linestyle="--")
    if filename is None:
        _PLOT_COUNTER[0] += 1
        filename = f"Joint_values_{_PLOT_COUNTER[0]}.png"
    fig.savefig(filename)
    plt.close(fig)
    print(f"Saved trajectory to {filename}.")
    return filename
