"""Offline pipeline tests (learn/offline.py + learn/generate_data.py):
shard writing, unite/extract, dataset split, supervised BCE training, and
the end-to-end generate driver on a tiny env."""

import dataclasses
import glob
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.conftest import ref_scene

from mujoco_rl_ur5_tpu.learn import AgentConfig, GraspAgent
from mujoco_rl_ur5_tpu.learn.offline import (
    AverageMeter, GraspingDataset, ShardWriter, binary_accuracy,
    extract_positives, train_offline, unite_data,
)


def test_shard_writer_and_unite(tmp_path):
    w = ShardWriter(str(tmp_path / "data"), file_size=4)
    for i in range(10):
        w.push(np.full((8, 8, 4), float(i), np.float32), i, float(i % 2))
    assert w.n_files == 2                       # 8 banked, 2 pending
    w.push(np.zeros((2, 8, 8, 4), np.float32), [90, 91], [1.0, 0.0])
    assert w.n_files == 3
    n = unite_data(str(tmp_path / "data" / "*.npz"),
                   str(tmp_path / "all.npz"))
    assert n == 12
    pos = extract_positives(str(tmp_path / "all.npz"),
                            str(tmp_path / "pos.npz"))
    d = np.load(str(tmp_path / "pos.npz"))
    assert pos == len(d["rewards"]) and (d["rewards"] >= 0.5).all()


def test_dataset_split_and_train(tmp_path):
    rng = np.random.default_rng(0)
    n = 40
    states = rng.uniform(0, 1, (n, 16, 16, 4)).astype(np.float32)
    actions = rng.integers(0, 6 * 16 * 16, n).astype(np.int32)
    rewards = (rng.uniform(0, 1, n) > 0.5).astype(np.float32)
    np.savez_compressed(str(tmp_path / "ds.npz"), states=states,
                        actions=actions, rewards=rewards)
    ds = GraspingDataset(str(tmp_path / "ds.npz"))
    (s_tr, a_tr, r_tr), (s_te, a_te, r_te) = ds.split(0.8, seed=0)
    assert s_tr.shape[0] == 32 and s_te.shape[0] == 8

    agent = GraspAgent(AgentConfig(width=16, height=16, memory_size=16,
                                   batch_size=8, dtype="float32"))
    ts = agent.init(jax.random.PRNGKey(0))
    ts, hist = train_offline(agent, ts, ds, epochs=3, batch=8,
                             log=lambda *_: None)
    assert len(hist) == 3
    assert np.isfinite([h["train_loss"] for h in hist]).all()
    assert hist[-1]["train_loss"] < hist[0]["train_loss"] * 1.5


def test_binary_accuracy_thresholds():
    q = jnp.asarray([0.9, 0.6, 0.2, 0.4])
    r = jnp.asarray([1.0, 0.0, 0.0, 1.0])
    ap, an = binary_accuracy(q, r)
    assert float(ap) == pytest.approx(0.5)     # one of two positives > .5
    assert float(an) == pytest.approx(0.5)     # one of two negatives < .3


def test_average_meter():
    m = AverageMeter()
    m.update(2.0, 2)
    m.update(4.0, 2)
    assert m.avg == pytest.approx(3.0)


def test_generate_driver_end_to_end(tmp_path):
    """generate(): tiny env + random policy banks B transitions per step
    into shards (Offline RL/generate_data.py:14-132 behavior)."""
    from mujoco_rl_ur5_tpu.learn.generate_data import generate
    from mujoco_rl_ur5_tpu.utils.config import (
        Config, EnvConfig, SceneConfig, SolverConfig, TrainConfig,
    )

    cfg = Config(
        scene=SceneConfig(path=ref_scene(
            "UR5gripper_2_finger_many_objects.xml")),
        solver=SolverConfig(ncon=64, iterations=5),
        env=EnvConfig(image_width=16, image_height=16, budget_scale=0.004),
        agent=AgentConfig(width=16, height=16, memory_size=16, batch_size=4,
                          dtype="float32"),
        train=TrainConfig(batch_envs=2, seed=5),
    )
    out = str(tmp_path / "Data")
    total, files, positives = generate(cfg, out_dir=out, episodes=1,
                                       steps_per_episode=3, file_size=3,
                                       verbose=False)
    assert total == 6 and files == 2
    shards = sorted(glob.glob(os.path.join(out, "*.npz")))
    assert len(shards) == 2
    d = np.load(shards[0])
    assert d["states"].shape == (3, 16, 16, 4)
    assert d["actions"].dtype == np.int32
