"""Pile-settle NaN reproduction (CPU): B=2, ncon=256, 1000 steps, seed 3."""
import sys

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.scene import load_model, make_state


def run(ncon=256, iterations=30, steps=1000, B=2, seed=3):
    m = load_model(
        "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml")
    t = m.topo
    state = make_state(m, (B,))
    qpos = np.tile(np.asarray(m.qpos0), (B, 1))
    fj = np.nonzero(t.jnt_type == 0)[0]
    rng = np.random.RandomState(seed)
    for j in fj:
        qa = int(t.jnt_qposadr[j])
        qpos[:, qa + 0] = rng.uniform(-.25, .25, B)
        qpos[:, qa + 1] = rng.uniform(-.77, -.43, B)
        qpos[:, qa + 2] = rng.uniform(1.0, 1.5, B)
    state = state.replace(qpos=jnp.asarray(qpos, jnp.float32))

    @jax.jit
    def roll(s):
        def body(s, _):
            s2 = jax.vmap(lambda x: dynamics.step(
                m, x, ncon=ncon, iterations=iterations))(s)
            return s2, jnp.max(jnp.abs(s2.qvel))
        s, vmaxs = jax.lax.scan(body, s, None, length=steps)
        return s, vmaxs

    _, vmaxs = jax.block_until_ready(roll(state))
    vmaxs = np.asarray(vmaxs)
    bad = np.isnan(vmaxs) | (vmaxs > 1e3)
    first = int(np.argmax(bad)) if bad.any() else -1
    print(f"ncon={ncon} it={iterations}: vmax[{steps-1}]={vmaxs[-1]:.3f} "
          f"first blowup step={first}")
    return first


if __name__ == "__main__":
    import sys
    ncon = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    it = int(sys.argv[2]) if len(sys.argv) > 2 else 30
    run(ncon=ncon, iterations=it)
