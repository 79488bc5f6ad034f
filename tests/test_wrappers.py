"""Wrapper tests (counterpart of the reference's test_wrappers.py scope)."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make


def test_flatten_action_space():
    from maniskill_tpu.wrappers import FlattenActionSpaceWrapper

    env = make("PushCube-v1", num_envs=2)
    wrapped = FlattenActionSpaceWrapper(env)
    assert wrapped.single_action_space.shape == (8,)
    obs, _ = wrapped.reset(seed=0)
    obs, rew, term, trunc, info = wrapped.step(
        np.zeros((2, 8), np.float32)
    )
    assert rew.shape == (2,)
    env.close()


def test_cpu_gym_wrapper():
    from maniskill_tpu.wrappers import CPUGymWrapper

    env = make("PushCube-v1", num_envs=1)
    wrapped = CPUGymWrapper(env, record_metrics=True)
    obs, info = wrapped.reset(seed=0)
    assert isinstance(obs, np.ndarray) and obs.ndim == 1
    obs, rew, term, trunc, info = wrapped.step(wrapped.action_space.sample())
    assert isinstance(rew, float)
    assert isinstance(term, bool)
    assert "episode" in info
    env.close()


def test_frame_stack():
    from maniskill_tpu.wrappers import FrameStack

    env = make("PushCube-v1", num_envs=2)
    wrapped = FrameStack(env, num_stack=3)
    obs, _ = wrapped.reset(seed=0)
    assert obs.shape[1] == 3
    obs, *_ = wrapped.step(env.unwrapped.action_space.sample())
    assert obs.shape[1] == 3
    env.close()


def test_record_episode(tmp_path):
    from maniskill_tpu.wrappers import RecordEpisode

    env = make("PushCube-v1", num_envs=2)
    rec = RecordEpisode(
        env, str(tmp_path), save_video=False, trajectory_name="test_traj"
    )
    rec.reset(seed=0)
    for _ in range(4):
        rec.step(env.unwrapped.action_space.sample())
    rec.close()

    import h5py, json

    h5_path = tmp_path / "test_traj.h5"
    assert h5_path.exists()
    with h5py.File(h5_path) as f:
        assert "traj_0" in f
        traj = f["traj_0"]
        assert traj["actions"].shape[0] == 4
        assert "env_states" in traj
        assert traj["env_states"]["actors"]["cube"].shape[0] == 5  # init + 4 steps
    with open(tmp_path / "test_traj.json") as f:
        meta = json.load(f)
    # per-episode schema: one entry per env (record.py splits episodes
    # per-env, the reference RecordEpisode's GPU-sim behavior)
    assert len(meta["episodes"]) == 2
    env.close()


def test_trajectory_dataset(tmp_path):
    from maniskill_tpu.wrappers import RecordEpisode
    from maniskill_tpu.trajectory.dataset import ManiSkillTrajectoryDataset

    env = make("PushCube-v1", num_envs=1)
    rec = RecordEpisode(env, str(tmp_path), save_video=False, trajectory_name="t")
    rec.reset(seed=0)
    for _ in range(3):
        rec.step(env.unwrapped.action_space.sample())
    rec.close()
    ds = ManiSkillTrajectoryDataset(str(tmp_path / "t.h5"))
    assert len(ds) == 3
    item = ds[0]
    assert "action" in item
    ds.close()
    env.close()


def test_action_repeat():
    from maniskill_tpu.wrappers import ActionRepeatWrapper

    env = make("PushCube-v1", num_envs=2)
    wrapped = ActionRepeatWrapper(env, repeat=2)
    wrapped.reset(seed=0)
    obs, rew, term, trunc, info = wrapped.step(env.unwrapped.action_space.sample() * 0)
    assert np.asarray(env.unwrapped.elapsed_steps).max() == 2
    env.close()
