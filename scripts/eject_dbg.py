"""Dump box-contact normals/forces through the parity close phase to
diagnose the pinch ejection (our engine launches the box; MuJoCo holds
it). CPU."""
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from tests.test_grasp_parity import _ik, HOME, PHASES
from mujoco_rl_ur5_tpu.control import Controller
from mujoco_rl_ur5_tpu.control.ik import ArmChain
from mujoco_rl_ur5_tpu.control.pid import pid_output, reference_gains
from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.scene import load_model, make_state
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_FREE

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"
BOXG = {40}


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
    dof_box = t.jnt_dofadr[free[10]]
    qpos[qa_box:qa_box + 3] = [0.0, -0.60, 0.94]
    qpos[qa_box + 3:qa_box + 7] = [1, 0, 0, 0]
    chain = ArmChain(model)
    q0 = jnp.asarray(qpos, jnp.float32)
    pre, _ = _ik(model, chain, [0.0, -0.6, 1.1], q0)
    low, _ = _ik(model, chain, [0.0, -0.6, 0.92], q0)
    sp = np.tile(HOME[:7], (sum(PHASES), 1)).astype(np.float32)
    o = 0
    for i, n in enumerate(PHASES):
        sp[o:o + n, :5] = low if i in (1, 2) else pre
        sp[o:o + n, 6] = -0.4 if i >= 2 else 0.0
        o += n
    ctl = Controller(model, ncon=128)
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
            st = dynamics.step(model, st.replace(ctrl=u), ncon=128,
                               iterations=ctl.iterations)
            return (st, ps), None
        (st, ps), _ = jax.lax.scan(body, (state, ps), sched)
        return st, ps

    @jax.jit
    def step1(st, ps, spk):
        q = st.qpos[qadr]
        u, ps = pid_output(g, ps, spk, q, ctl.dt)
        st2 = dynamics.step(model, st.replace(ctrl=u), ncon=128,
                            iterations=ctl.iterations)
        return st2, ps

    @jax.jit
    def diag(st):
        _, _, cs = dynamics.forward(model, st, ncon=128,
                                    iterations=ctl.iterations)
        return cs

    def log(m):
        print(m, file=sys.stderr, flush=True)

    st, ps = run(state, ps, jnp.asarray(sp[:600]))
    sched = jnp.asarray(sp[600:850])
    burst = 0
    for k in range(250):
        st, ps = step1(st, ps, sched[k])
        bv = float(jnp.linalg.norm(st.qvel[dof_box:dof_box + 3]))
        if k % 10 == 0 or bv > 0.5:
            log(f"k={k} boxv={bv:.3f} "
                f"fingers={np.round(np.asarray(st.qpos[6:8]), 4)} "
                f"boxz={float(st.qpos[qa_box + 2]):.4f}")
            cs = diag(st)
            g1 = np.asarray(cs.geom1)
            g2 = np.asarray(cs.geom2)
            act = np.asarray(cs.active)
            dist = np.asarray(cs.dist)
            nrm = np.asarray(cs.frame)[:, 0]
            F = np.asarray(cs.forces)
            for i in range(len(act)):
                if act[i] and (g1[i] in BOXG or g2[i] in BOXG):
                    log(f"   g{g1[i]}-g{g2[i]} d={dist[i]:.5f} "
                        f"n={np.round(nrm[i], 3)} f={np.round(F[i, :3], 2)}")
        if bv > 0.5:
            burst += 1
            if burst > 4:
                break
    log(f"final box: {np.round(np.asarray(st.qpos[qa_box:qa_box+3]), 4)}")


if __name__ == "__main__":
    main()
