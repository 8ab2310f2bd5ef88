"""Side-by-side close-phase comparison: the parity-test PID schedule
(tests/test_grasp_parity.py::test_box_grasp_lifts_in_both_engines) vs the
MPC policy pipeline, same scene, same box. Prints the close-entry state
and the close outcome for both. CPU."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from mujoco_rl_ur5_tpu.control import Controller
from mujoco_rl_ur5_tpu.control.ik import ArmChain, ik_solve
from mujoco_rl_ur5_tpu.control.pid import pid_output, reference_gains
from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.scene import load_model, make_state
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_FREE

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"
HOME = np.array([0, -1.57, 1.57, -1.57, -1.57, 0, 0.3, 0.3])
PHASES = [400, 200, 250, 300]


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    model = load_model(SCENE)
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

    chain = ArmChain(model)
    q0 = jnp.asarray(qpos, jnp.float32)
    pre, _, ok1 = ik_solve(model, chain, jnp.asarray([0, -0.6, 1.1], jnp.float32), q0)
    low, _, ok2 = ik_solve(model, chain, jnp.asarray([0, -0.6, 0.92], jnp.float32), q0)
    assert bool(ok1) and bool(ok2)
    pre, low = np.asarray(pre), np.asarray(low)

    sp = np.tile(HOME[:7], (sum(PHASES), 1)).astype(np.float32)
    o = 0
    for i, n in enumerate(PHASES):
        sp[o:o + n, :5] = low if i in (1, 2) else pre
        sp[o:o + n, 6] = -0.4 if i >= 2 else 0.0
        o += n

    ctl = Controller(model, ncon=64)
    g = reference_gains()
    qadr = ctl.act_qadr
    state = make_state(model).replace(qpos=jnp.asarray(qpos, jnp.float32))
    ps = ctl.init(qpos0=jnp.asarray(qpos, jnp.float32)).pid

    @jax.jit
    def run(state, ps, sched):
        def body(carry, spk):
            st, ps = carry
            q = st.qpos[qadr]
            u, ps = pid_output(g, ps, spk, q, ctl.dt)
            st = dynamics.step(model, st.replace(ctrl=u), ncon=64,
                               iterations=ctl.iterations)
            return (st, ps), None
        (st, ps), _ = jax.lax.scan(body, (state, ps), sched)
        return st, ps

    # pre + descend
    st, ps = run(state, ps, jnp.asarray(sp[:600]))
    x = np.asarray(st.qpos[:8])
    v = np.asarray(st.qvel[:8])
    log(f"[parity] close entry: arm_q={np.round(x, 4)}")
    log(f"[parity] close entry: qvel={np.round(v, 4)} "
        f"box={np.round(np.asarray(st.qpos[qa_box:qa_box+3]), 4)}")
    gc = np.asarray(ctl.grasp_center(st))
    log(f"[parity] grasp center={np.round(gc, 4)} sp_low={np.round(low, 4)}")
    # close
    st2, ps2 = run(st, ps, jnp.asarray(sp[600:850]))
    log(f"[parity] after close: box="
        f"{np.round(np.asarray(st2.qpos[qa_box:qa_box+3]), 4)} "
        f"fingers={np.round(np.asarray(st2.qpos[6:8]), 4)}")
    # lift
    st3, _ = run(st2, ps2, jnp.asarray(sp[850:]))
    log(f"[parity] after lift: box_z={float(st3.qpos[qa_box+2]):.4f}")


if __name__ == "__main__":
    main()
