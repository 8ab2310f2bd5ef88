"""Device-resident replay buffer.

Capability parity with Modules.py:28-55 (`ReplayBuffer`): fixed capacity,
ring-buffer overwrite (`position = (position+1) % capacity`, :41-44), and the
deliberate sampling quirk — `sample(B)` returns B-1 uniformly random
transitions PLUS the most recently pushed one (Modules.py:46-49), which the
reference uses to guarantee the newest experience is always trained on.

TPU re-design: instead of a Python list of torch tensors on the host, the
buffer is a pytree of preallocated device arrays with a functional
`push`/`sample` (pure, jit-able). With gamma = 0 the reference stores
`simple_Transition(state, action, reward)` (Modules.py:13,
Grasping_Agent_multidiscrete.py:552); we store exactly those fields. The
whole buffer lives in HBM, so sampling never crosses the host boundary; under
`pjit` the capacity axis can be sharded over the data-parallel mesh axis.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class ReplayState:
    """Functional buffer state (a pytree; donate between steps)."""

    states: jax.Array    # (cap, H, W, C)
    actions: jax.Array   # (cap,) int32 flat action index
    rewards: jax.Array   # (cap,) float32
    position: jax.Array  # () int32 next write slot
    size: jax.Array      # () int32 valid entries


class ReplayBuffer:
    """Static configuration + pure ops over ReplayState."""

    def __init__(self, capacity: int, obs_shape: Tuple[int, ...],
                 obs_dtype=jnp.float32):
        self.capacity = capacity
        self.obs_shape = tuple(obs_shape)
        self.obs_dtype = obs_dtype

    def init(self) -> ReplayState:
        return ReplayState(
            states=jnp.zeros((self.capacity,) + self.obs_shape,
                             self.obs_dtype),
            actions=jnp.zeros((self.capacity,), jnp.int32),
            rewards=jnp.zeros((self.capacity,), jnp.float32),
            position=jnp.zeros((), jnp.int32),
            size=jnp.zeros((), jnp.int32),
        )

    @partial(jax.jit, static_argnums=0, donate_argnums=1)
    def push(self, buf: ReplayState, state, action, reward) -> ReplayState:
        """Insert one transition at the ring position (Modules.py:38-44).

        Also accepts a leading batch axis on (state, action, reward): a
        batched env step banks all B transitions in one call (writes wrap
        modulo capacity, newest-wins on collision like the reference ring).
        """
        state = jnp.asarray(state, self.obs_dtype)
        action = jnp.asarray(action, jnp.int32)
        reward = jnp.asarray(reward, jnp.float32)
        if state.ndim == len(self.obs_shape):          # single transition
            state, action, reward = state[None], action[None], reward[None]
        n = state.shape[0]
        idx = (buf.position + jnp.arange(n)) % self.capacity
        return ReplayState(
            states=buf.states.at[idx].set(state),
            actions=buf.actions.at[idx].set(action.reshape(n)),
            rewards=buf.rewards.at[idx].set(reward.reshape(n)),
            position=(buf.position + n) % self.capacity,
            size=jnp.minimum(buf.size + n, self.capacity),
        )

    @partial(jax.jit, static_argnums=(0, 3))
    def sample(self, buf: ReplayState, key: jax.Array, batch_size: int):
        """(batch_size - 1) uniform WITHOUT replacement + the most recent
        transition (Modules.py:46-49 uses random.sample). Returns
        (states, actions, rewards).

        Without-replacement with a dynamic valid range under jit: draw a
        uniform score per slot, mask invalid slots to -inf, take the top
        (batch_size - 1) — exactly a uniform no-replacement sample over the
        first `size` slots."""
        newest = (buf.position - 1) % self.capacity
        scores = jax.random.uniform(key, (self.capacity,))
        scores = jnp.where(jnp.arange(self.capacity) < buf.size, scores,
                           -jnp.inf)
        _, rand = jax.lax.top_k(scores, batch_size - 1)
        idx = jnp.concatenate([rand.astype(jnp.int32), newest[None]])
        return buf.states[idx], buf.actions[idx], buf.rewards[idx]

    def __len__(self):  # mirrors Modules.py:51-52 semantics via host readback
        raise TypeError("use int(buf.size) on the ReplayState")
