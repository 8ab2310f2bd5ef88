"""Trace the collide-only path on TPU and print top self-time HLO ops."""
import glob
import json
import shutil
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from mujoco_rl_ur5_tpu.physics.constraints import collide, make_contacts
from mujoco_rl_ur5_tpu.physics.kinematics import fk
from mujoco_rl_ur5_tpu.scene import load_model, make_state

SCENE = "/root/reference/UR5+gripper/UR5gripper_2_finger_many_objects.xml"


def main():
    model = load_model(SCENE)
    B = 256
    state = make_state(model, (B,))

    what = sys.argv[1] if len(sys.argv) > 1 else "collide"
    if what == "collide":
        @jax.jit
        def run(s):
            def one(q):
                kin = fk(model, q)
                _, _, d, p = collide(model, kin)
                return d.sum()
            return jax.vmap(one)(s.qpos)
    else:
        @jax.jit
        def run(s):
            def one(q):
                kin = fk(model, q)
                con = make_contacts(model, kin, 128)
                return con.dist.sum() + con.J1.sum()
            return jax.vmap(one)(s.qpos)

    jax.block_until_ready(run(state))
    shutil.rmtree("/tmp/jaxtrace2", ignore_errors=True)
    jax.profiler.start_trace("/tmp/jaxtrace2")
    for _ in range(5):
        jax.block_until_ready(run(state))
    jax.profiler.stop_trace()

    from tensorflow.python.profiler.internal import _pywrap_profiler_plugin as pp
    f = glob.glob("/tmp/jaxtrace2/plugins/profile/*/*.xplane.pb")[0]
    out, ok = pp.xspace_to_tools_data([f], "hlo_stats", {})
    data = json.loads(out)
    cols = [c["label"] if isinstance(c, dict) else c for c in data["cols"]]
    def cell(r):
        return [c.get("v") if isinstance(c, dict) else c
                for c in (r["c"] if isinstance(r, dict) else r)]
    parsed = [cell(r) for r in data["rows"]]
    idx = {k: cols.index(k) for k in
           ["HLO op category", "#Occurrences", "Total self time (us)",
            "Bound by", "Framework op name", "Source Info"]}
    parsed.sort(key=lambda r: -(r[idx["Total self time (us)"]] or 0))
    tot = sum(r[idx["Total self time (us)"]] or 0 for r in parsed)
    print(f"total: {tot/1e3:.1f} ms over 5 runs -> {tot/5e3:.1f} ms/run")
    for r in parsed[:25]:
        print(f'{(r[idx["Total self time (us)"]] or 0)/5e3:7.2f} ms '
              f'x{r[idx["#Occurrences"]]:<4} {str(r[idx["HLO op category"]])[:16]:16} '
              f'{str(r[idx["Bound by"]])[:9]:9} '
              f'{str(r[idx["Framework op name"]])[:55]:55} '
              f'{str(r[idx["Source Info"]])[:38]}')


if __name__ == "__main__":
    main()
