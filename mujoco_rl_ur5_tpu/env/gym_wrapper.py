"""Gymnasium wrapper: the reference's public single-env API over the
batched functional core.

Reference surface reproduced (gym_grasper/):
  * registration of a Gym id (`__init__.py:4-7` registers "Grasper-v0");
    here: `gymnasium.make("mujoco_rl_ur5_tpu/Grasper-v0")` (module import
    registers it; `register_envs()` is idempotent for explicit use);
  * `GraspEnv.step(action, record_grasps=False, markers=False)` ->
    (obs, reward, done, info) old-Gym 4-tuple (GraspingEnv.py:62) — the
    wrapper implements the gymnasium 5-tuple and keeps `done` semantics
    (never terminates; the training loop truncates by episode length);
  * constructor kwargs file/image_width/image_height/show_obs/demo
    (GraspingEnv.py:28-36);
  * `action_space` MultiDiscrete([H*W, 6]) (:158-165),
    dict observations {"rgb", "depth"} (:390-406);
  * `print_info()` (:483-489) and `close()` (:479);
  * `record_grasps`: captures a side-camera image after the grasp check
    (:329-335) into `self.grasp_captures` (host list, off the hot path).

One wrapper instance owns one scenario slot of the jitted batched core; the
TPU-native path for training remains the batched `env.GraspEnv` — this class
exists for API/ecosystem compatibility (gymnasium.make, SB3-style loops,
quick demos) and costs one device program of batch 1.
"""

from __future__ import annotations

from typing import Optional

import gymnasium
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from mujoco_rl_ur5_tpu.env.grasp_env import GraspEnv as _BatchedGraspEnv
from mujoco_rl_ur5_tpu.env.grasp_env import ROTATIONS
from mujoco_rl_ur5_tpu.render import make_camera
from mujoco_rl_ur5_tpu.render.raycast import render_rgbd
from mujoco_rl_ur5_tpu.scene import load_model

DEFAULT_SCENE = ("/root/reference/UR5+gripper/"
                 "UR5gripper_2_finger_many_objects.xml")


class GrasperEnv(gymnasium.Env):
    """Single-env Gymnasium face of the batched grasp environment."""

    metadata = {"render_modes": ["rgb_array"], "render_fps": 500}

    def __init__(self, file: str = DEFAULT_SCENE, image_width: int = 200,
                 image_height: int = 200, show_obs: bool = False,
                 demo: bool = False, render_mode: Optional[str] = None,
                 ncon: int = 128, iterations: Optional[int] = None,
                 budget_scale: float = 1.0):
        self.model = load_model(file)
        self.core = _BatchedGraspEnv(
            self.model, ncon=ncon, iterations=iterations,
            image_width=image_width, image_height=image_height, demo=demo,
            budget_scale=budget_scale)
        self.IMAGE_WIDTH, self.IMAGE_HEIGHT = image_width, image_height
        self.TABLE_HEIGHT = 0.91                      # GraspingEnv.py:56
        self.show_obs = show_obs
        self.render_mode = render_mode
        self.action_space = spaces.MultiDiscrete(
            [image_width * image_height, len(ROTATIONS)])
        self.observation_space = spaces.Dict({
            "rgb": spaces.Box(0, 255, (image_height, image_width, 3),
                              np.uint8),
            "depth": spaces.Box(0.0, np.inf, (image_height, image_width),
                                np.float32),
        })
        self._reset_fn = jax.jit(self.core.reset)
        self._step_fn = jax.jit(self.core.step)
        self._es = None
        self.current_observation = None
        self.grasp_captures: list[np.ndarray] = []
        self._side_cam = None
        self._markers: list = []

    # -- gymnasium API ----------------------------------------------------------

    def reset(self, *, seed: Optional[int] = None, options=None):
        super().reset(seed=seed)
        key = jax.random.PRNGKey(
            self.np_random.integers(2**31 - 1) if seed is None else seed)
        self._es = self._reset_fn(key)
        obs = self._obs()
        return obs, {}

    def step(self, action, record_grasps: bool = False):
        """action = [pixel_idx, rotation]. Returns the gymnasium 5-tuple;
        `terminated` is always False like the reference's `done`
        (GraspingEnv.py:156)."""
        assert self._es is not None, "call reset() first"
        a = jnp.asarray(np.asarray(action), jnp.int32)
        self._es, reward, done, info = self._step_fn(self._es, a)
        info = {k: np.asarray(v) for k, v in info.items()}
        if record_grasps and bool(info["grasped"]):
            self.grasp_captures.append(self.capture_side_camera())
        obs = self._obs()
        if self.show_obs:
            self._show(obs)
        return obs, float(reward), False, False, info

    def render(self):
        if self.render_mode == "rgb_array":
            return np.asarray(self._es.rgb)
        return None

    def close(self):
        self._es = None

    # -- reference extras ---------------------------------------------------------

    def capture_side_camera(self, width: int = 1000,
                            height: int = 1000) -> np.ndarray:
        """Side-camera grasp capture (GraspingEnv.py:329-335): a 1000x1000
        RGB render from the scene's `side` camera."""
        if self._side_cam is None or self._side_cam.width != width:
            cam = make_camera(self.model, "side", width, height)
            from mujoco_rl_ur5_tpu.physics.kinematics import fk

            self._side_cam = cam
            self._side_render = jax.jit(
                lambda q: render_rgbd(self.model, fk(self.model, q), cam))
        rgb, _ = self._side_render(self._es.sim.qpos)
        return np.asarray(rgb)

    def add_marker(self, position, label: str = "", size: float = 3,
                   color=(1.0, 0.0, 0.0)):
        """Mark a world position in subsequent rendered frames
        (MJ_Controller.add_marker, MujocoController.py:808-826: the
        reference drew viewer markers; headless, we draw a crosshair into
        the RGB observation at the point's top_down projection)."""
        self._markers.append((np.asarray(position, np.float64), label,
                              int(size), tuple(color)))

    def clear_markers(self):
        self._markers.clear()

    def render_with_markers(self) -> np.ndarray:
        """Current RGB observation with all markers drawn."""
        from mujoco_rl_ur5_tpu.render import world_2_pixel

        rgb = np.asarray(self._es.rgb).copy()
        H, W = rgb.shape[:2]
        for pos, _, size, color in self._markers:
            px, py = world_2_pixel(self.core.cam, jnp.asarray(pos))
            # observation images are flipped [::-1, ::-1] (reference flips)
            x = W - 1 - int(px)
            y = H - 1 - int(py)
            if 0 <= x < W and 0 <= y < H:
                c = (np.asarray(color) * 255).astype(np.uint8)
                rgb[max(0, y - size):y + size + 1, x] = c
                rgb[y, max(0, x - size):x + size + 1] = c
        return rgb

    def print_info(self):
        """GraspingEnv.py:483-489."""
        t = self.model.topo
        print("Model timestep:", t.timestep)
        print("Set number of frames skipped: ", 1)
        print("dt = timestep * frame_skip: ", t.timestep)
        print("Frames per second = 1/dt: ", 1.0 / t.timestep)
        print("Actionspace: ", self.action_space)
        print("Observation space:", self.observation_space)

    # -- helpers -------------------------------------------------------------------

    def _obs(self):
        obs = {"rgb": np.asarray(self._es.rgb),
               "depth": np.asarray(self._es.depth, np.float32)}
        self.current_observation = obs
        return obs

    def _show(self, obs):
        try:
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, axes = plt.subplots(1, 2)
            axes[0].imshow(obs["rgb"])
            axes[1].imshow(obs["depth"])
            fig.savefig("/tmp/grasper_obs.png")
            plt.close(fig)
        except Exception:
            pass


def register_envs():
    """Idempotent gymnasium registration (gym_grasper/__init__.py:4-7)."""
    gid = "mujoco_rl_ur5_tpu/Grasper-v0"
    if gid not in gymnasium.registry:
        gymnasium.register(
            id=gid,
            entry_point="mujoco_rl_ur5_tpu.env.gym_wrapper:GrasperEnv")


register_envs()
