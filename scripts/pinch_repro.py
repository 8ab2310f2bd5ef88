"""Box-pinch repro: the parity-test schedule driven through our engine
(warm-started PID rollout). Ground truth: MuJoCo holds the box and lifts
it to z=1.088 near [0,-0.6]; report our final box pose. CPU.

Usage: python scripts/pinch_repro.py [iterations] [ncon] [close_sp] [--mj]
"""
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
from mujoco_rl_ur5_tpu.physics import constraints, dynamics
from mujoco_rl_ur5_tpu.scene import load_model, make_state
from mujoco_rl_ur5_tpu.scene.mjcf import JNT_FREE

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else None
    ncon = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    close_sp = float(sys.argv[3]) if len(sys.argv) > 3 else -0.4
    use_mj = "--mj" in sys.argv
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
    pre, _ = _ik(model, chain, [0.0, -0.6, 1.1], q0)
    low, _ = _ik(model, chain, [0.0, -0.6, 0.92], q0)
    sp = np.tile(HOME[:7], (sum(PHASES), 1)).astype(np.float32)
    o = 0
    for i, n in enumerate(PHASES):
        sp[o:o + n, :5] = low if i in (1, 2) else pre
        sp[o:o + n, 6] = close_sp if i >= 2 else 0.0
        o += n
    g = reference_gains()
    if use_mj:
        import mujoco
        mm = mujoco.MjModel.from_xml_path(SCENE)
        dd = mujoco.MjData(mm)
        dd.qpos[:] = qpos
        act_j = [mm.actuator_trnid[i, 0] for i in range(mm.nu)]
        qadr_m = np.array([mm.jnt_qposadr[j] for j in act_j])
        kp, kd = np.asarray(g.kp), np.asarray(g.kd)
        lo, hi = np.asarray(g.out_lo), np.asarray(g.out_hi)
        dtm = mm.opt.timestep
        last = None
        for k in range(len(sp)):
            q = dd.qpos[qadr_m].copy()
            d = 0.0 if last is None else (q - last) / dtm
            last = q
            dd.ctrl[:] = np.clip(kp * (sp[k] - q) - kd * d, lo, hi)
            mujoco.mj_step(mm, dd)
        box = dd.qpos[qa_box:qa_box + 3]
        print(f"MJ close_sp={close_sp}: final box {np.round(box, 4)} "
              f"fingers {np.round(dd.qpos[6:8], 4)}",
              file=sys.stderr, flush=True)
        held = (abs(box[0]) < 0.15 and abs(box[1] + 0.6) < 0.15
                and box[2] > 0.965)
        print(f"MJ HELD={held}", file=sys.stderr, flush=True)
        return
    ctl = Controller(model, ncon=ncon)
    iters = ctl.iterations if iters is None else iters
    qadr = ctl.act_qadr
    state = make_state(model).replace(qpos=jnp.asarray(qpos, jnp.float32))
    ps = ctl.init(qpos0=jnp.asarray(qpos, jnp.float32)).pid
    warm = constraints.init_warm(model, state)

    @jax.jit
    def run(state, ps, warm, sched):
        def body(carry, spk):
            st, ps, warm = carry
            q = st.qpos[qadr]
            u, ps = pid_output(g, ps, spk, q, ctl.dt)
            st, warm = dynamics.step_warm(model, st.replace(ctrl=u), warm,
                                          ncon=ncon, iterations=iters)
            return (st, ps, warm), None
        (st, ps, warm), _ = jax.lax.scan(body, (state, ps, warm), sched)
        return st, ps, warm

    st, ps, warm = run(state, ps, warm, jnp.asarray(sp))
    box = np.asarray(st.qpos[qa_box:qa_box + 3])
    print(f"iters={iters} ncon={ncon}: final box {np.round(box, 4)} "
          f"fingers {np.round(np.asarray(st.qpos[6:8]), 4)} "
          f"(mj ground truth: [-0.005, -0.609, 1.088])",
          file=sys.stderr, flush=True)
    held = (abs(box[0]) < 0.15 and abs(box[1] + 0.6) < 0.15 and box[2] > 0.965)
    print(f"HELD={held}", file=sys.stderr, flush=True)


if __name__ == "__main__":
    main()
