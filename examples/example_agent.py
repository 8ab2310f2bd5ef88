"""Random-agent env rollout — the TPU port of
/root/reference/example_agent.py: gymnasium.make the registered env, sample
random actions, step with record_grasps=True.

Usage: PYTHONPATH=/root/repo python examples/example_agent.py \
    [--episodes N] [--steps K] [--image 64] [--budget-scale S]
"""

import argparse
import os

if os.environ.get("FORCE_CPU"):
    import jax as _jax

    _jax.config.update("jax_platforms", "cpu")

import gymnasium

import mujoco_rl_ur5_tpu.env  # noqa: F401 -- registers Grasper-v0


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--episodes", type=int, default=100)
    p.add_argument("--steps", type=int, default=100)
    p.add_argument("--image", type=int, default=200)
    p.add_argument("--budget-scale", type=float, default=1.0)
    args = p.parse_args()

    from mujoco_rl_ur5_tpu.env import register_envs

    register_envs()
    env = gymnasium.make(
        "mujoco_rl_ur5_tpu/Grasper-v0", image_width=args.image,
        image_height=args.image, budget_scale=args.budget_scale)

    env.unwrapped.print_info()

    for episode in range(1, args.episodes + 1):
        obs, _ = env.reset(seed=episode)
        for step in range(args.steps):
            print("#" * 65)
            print(f"EPISODE {episode} STEP {step + 1}")
            print("#" * 65)
            action = env.action_space.sample()
            obs, reward, terminated, truncated, info = env.unwrapped.step(
                action, record_grasps=True)
            print(f"reward={reward} grasped={bool(info['grasped'])} "
                  f"captures={len(env.unwrapped.grasp_captures)}")

    env.close()
    print("Finished.")


if __name__ == "__main__":
    main()
