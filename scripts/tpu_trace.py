"""Capture an XLA device trace of the contact step and print the top ops."""
import glob
import gzip
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.physics import dynamics
from mujoco_rl_ur5_tpu.scene import load_model, make_state

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"


def log(m):
    print(m, file=sys.stderr, flush=True)


def main():
    model = load_model(SCENE)
    B, K = int(__import__("os").environ.get("TB","256")), 5
    state = make_state(model, (B,))

    @jax.jit
    def roll(s):
        def body(s, _):
            return jax.vmap(
                lambda x: dynamics.step(model, x, ncon=128, iterations=30)
            )(s), None
        s, _ = jax.lax.scan(body, s, None, length=K)
        return s

    jax.block_until_ready(roll(state))  # compile
    jax.profiler.start_trace("/tmp/jaxtrace")
    jax.block_until_ready(roll(state))
    jax.profiler.stop_trace()
    log("trace captured")

    # summarize: convert xplane -> op stats via the tensorboard plugin
    from tensorflow.python.profiler.internal import _pywrap_profiler_plugin  # noqa
    files = glob.glob("/tmp/jaxtrace/plugins/profile/*/*.xplane.pb")
    log(f"xplane files: {files}")


if __name__ == "__main__":
    main()
