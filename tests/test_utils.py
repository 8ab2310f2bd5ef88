"""Tests for utils/: decorator parity (reference decorators.py), the
metrics tracker's rolling windows and reference metric names, and the
config tree."""

import numpy as np
import pytest

from mujoco_rl_ur5_tpu.utils import (
    Config, MetricsTracker, block_timer, debug, dict2list, timer, typeassert,
)


def test_timer_blocks_and_returns(capsys):
    import jax.numpy as jnp

    @timer
    def f(x):
        return jnp.asarray(x) * 2

    out = f(3.0)
    assert float(out) == 6.0
    assert "'f' took" in capsys.readouterr().out


def test_block_timer_records():
    times = []
    with block_timer("x", out=times):
        sum(range(1000))
    assert len(times) == 1 and times[0] >= 0


def test_debug_prints_shapes(capsys):
    @debug
    def f(a):
        return {"arr": np.zeros((2, 3)), "n": 5}

    f(np.ones(4))
    out = capsys.readouterr().out
    assert "Debugging f" in out
    assert "shape=(2, 3)" in out


def test_typeassert_rejects():
    @typeassert(int, str)
    def f(a, b):
        return a

    assert f(1, "x") == 1
    with pytest.raises(TypeError):
        f("bad", "x")


def test_dict2list_stacks():
    @dict2list
    def f():
        return {"a": np.arange(3), "b": np.arange(3) + 10}

    out = f()
    assert out.shape == (2, 3)
    np.testing.assert_array_equal(out[1], [10, 11, 12])


def test_metrics_tracker_windows():
    tr = MetricsTracker(logdir=None)
    for i in range(1200):
        tr.step(i, float(i % 2), i % 6, 0.5, loss=0.1)
    assert len(tr.last_1000_rewards) == 1000
    assert len(tr.last_100_loss) == 100
    assert len(tr.last_1000_actions) == 1000


def test_metrics_writer_emits_reference_names(tmp_path):
    """With a real SummaryWriter, the reference scalar tags must appear in
    the event file (Grasping_Agent_multidiscrete.py:493-511)."""
    tr = MetricsTracker(logdir=str(tmp_path), run_name="t")
    counters = {"greedy_rotations": np.zeros(6, np.int32),
                "greedy_successes": np.zeros(6, np.int32),
                "random_successes": np.zeros(6, np.int32)}
    for i in range(110):
        tr.step(i, 1.0, 0, 0.9, loss=0.5, counters=counters)
    tr.close()
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator,
    )
    import os

    runs = [d for d in os.listdir(tmp_path)]
    assert runs
    # scalar tags are nested under run subdirs for add_scalars; check the
    # top-level run for the plain scalars
    acc = EventAccumulator(str(tmp_path / runs[0]))
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert "Epsilon" in tags
    assert "Mean reward/Last100" in tags
    assert "Mean loss/Last100" in tags


def test_run_name_encodes_hyperparams():
    from mujoco_rl_ur5_tpu.learn.agent import AgentConfig

    name = MetricsTracker.run_name(AgentConfig(), 81)
    assert "SEED=81" in name and "M=2000" in name and "B=12" in name
    assert name.startswith("SHORTSIGHTED")   # gamma == 0


def test_config_tree_replace():
    import dataclasses

    cfg = Config()
    assert cfg.agent.depth_clip == pytest.approx(1.1)
    cfg2 = cfg.replace(train=dataclasses.replace(cfg.train, episodes=3))
    assert cfg2.train.episodes == 3 and cfg.train.episodes == 1000
