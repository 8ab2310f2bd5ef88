"""Phase-wise NaN hunt for MPCGraspPolicy. CPU, small horizon."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mujoco_rl_ur5_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

from mujoco_rl_ur5_tpu.control.pid import pid_init
from mujoco_rl_ur5_tpu.mpc import GraspMPC, MPCGraspPolicy
from mujoco_rl_ur5_tpu.scene import load_model, make_state
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_FREE
from mujoco_rl_ur5_tpu.scene.reduce import load_arm_model

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"
HOME = np.array([0, -1.57, 1.57, -1.57, -1.57, 0, 0.3, 0.3])


def stats(name, st, pol):
    q = np.asarray(st.qpos)
    v = np.asarray(st.qvel)
    x = np.asarray(pol.mpc.x_from_state(st))
    print(f"{name}: qpos nan={np.isnan(q).any()} max|v_arm|="
          f"{np.abs(x[8:]).max():.3f} arm_q={np.round(x[:8], 3)}",
          file=sys.stderr, flush=True)


def main():
    H = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    S = int(sys.argv[2]) if len(sys.argv) > 2 else 8
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
    coords = jnp.asarray([0.0, -0.60, 0.92], jnp.float32)
    f = jnp.float32
    pid = pid_init(pol.nu)
    stats("init", state, pol)

    pre = coords.at[2].set(1.1).astype(f)
    low = coords.at[2].set(jnp.maximum(0.91, coords[2] - 0.01)).astype(f)

    def box(st, tag):
        b = np.asarray(st.qpos[qa_box:qa_box+3])
        print(f"{tag}: box={np.round(b,4)}", file=sys.stderr, flush=True)

    open_sp = jnp.asarray(0.0, f)
    close_sp = jnp.asarray(-0.4, f)
    t0 = time.perf_counter()
    st, ps, e1 = pol.move_to(state, pid, pre, open_sp)
    st = jax.block_until_ready(st)
    print(f"pre-grasp {time.perf_counter()-t0:.1f}s ee_err={float(e1):.4f}",
          file=sys.stderr, flush=True)
    stats("after pre-grasp", st, pol); box(st, "pre")

    st2, ps, e2 = pol.move_to(st, ps, low, open_sp)
    st2 = jax.block_until_ready(st2)
    print(f"descend ee_err={float(e2):.4f} target={np.asarray(low)}",
          file=sys.stderr, flush=True)
    stats("after descend", st2, pol); box(st2, "descend")
    ee = mpc.ee_pos(mpc.x_from_state(st2)[:mpc.nq])
    print(f"executed ee={np.round(np.asarray(ee),4)}", file=sys.stderr)

    st2, ps = jax.block_until_ready(pol.hold(st2, ps, open_sp, 50))
    stats("after stay", st2, pol); box(st2, "stay")

    # A/B: reference-PID close from the same state (test_grasp_parity's law)
    from mujoco_rl_ur5_tpu.control.pid import pid_output, reference_gains
    from mujoco_rl_ur5_tpu.physics import dynamics

    g = reference_gains()
    qadr = pol.model.topo.jnt_qposadr[pol.model.topo.act_jnt]
    sp_pid = st2.qpos[qadr].at[6].set(-0.4)

    @jax.jit
    def pid_close(st, ps, sp):
        def body(carry, _):
            st, ps = carry
            q = st.qpos[qadr]
            u, ps = pid_output(g, ps, sp, q, pol.dt)
            st = dynamics.step(pol.model, st.replace(ctrl=u), ncon=pol.ncon,
                               iterations=pol.iterations)
            return (st, ps), None
        (st, ps), _ = jax.lax.scan(body, (st, ps), None, length=250)
        return st, ps
    stp, _ = jax.block_until_ready(pid_close(st2, ps, sp_pid))
    box(stp, "close[PID]")
    print(f"  PID finger q={np.asarray(stp.qpos[pol.grip_qadr])}",
          file=sys.stderr, flush=True)

    st3, ps = jax.block_until_ready(pol.hold(st2, ps, close_sp, 250))
    stats("after close", st3, pol); box(st3, "close[hold]")
    print(f"finger q={np.asarray(st3.qpos[pol.grip_qadr])}", file=sys.stderr)

    st4, ps, _ = pol.move_to(st3, ps, pre, close_sp)
    st4 = jax.block_until_ready(st4)
    stats("after lift", st4, pol); box(st4, "lift")
    print(f"box z={float(st4.qpos[qa_box+2]):.4f} finger "
          f"q={np.asarray(st4.qpos[pol.grip_qadr])}", file=sys.stderr)


if __name__ == "__main__":
    main()


def close_ab():
    """A/B the close phase: pol.hold vs reference-PID close from the same
    post-descend state (saved by main via np.save when DEBUG_SAVE=1)."""
    pass
