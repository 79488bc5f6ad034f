"""Trajectory record/replay round-trip (counterpart of the reference's
test_replay_trajectory.py scope)."""
import json
import os

import h5py
import numpy as np
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import make
from maniskill_tpu.wrappers.record import RecordEpisode


def test_record_then_replay_by_env_states(tmp_path):
    env = make("PushCube-v1", num_envs=1)
    rec = RecordEpisode(env, str(tmp_path), save_video=False, trajectory_name="t")
    rec.reset(seed=11)
    rng = np.random.RandomState(0)
    acts = [rng.uniform(-1, 1, env.unwrapped.single_action_space.shape).astype(np.float32)
            for _ in range(5)]
    for a in acts:
        rec.step(a)
    rec.close()

    with h5py.File(tmp_path / "t.h5") as f:
        traj = f["traj_0"]
        actions = traj["actions"][()]
        cube_states = traj["env_states"]["actors"]["cube"][()]
    assert actions.shape[0] == 5
    # per-episode schema: env_states hold T+1 frames of this env's state
    # (reset snapshot + one per step), no batch axis (record.py docstring)
    assert cube_states.shape == (6, 13)

    # replay by actions from the recorded seed: must reproduce states
    env2 = make("PushCube-v1", num_envs=1)
    with open(tmp_path / "t.json") as fjson:
        meta = json.load(fjson)
    seed = meta["episodes"][0]["episode_seed"]
    if isinstance(seed, list):
        seed = seed[0]
    env2.reset(seed=int(seed))
    # the recorded initial cube state must match the re-seeded reset
    state0 = np.asarray(env2.unwrapped.get_state_dict()["actors"]["cube"])
    np.testing.assert_allclose(state0[0], cube_states[0], atol=1e-4)
    for i, a in enumerate(actions):
        env2.step(a if a.ndim == 1 else a[0])
    state_end = np.asarray(env2.unwrapped.get_state_dict()["actors"]["cube"])
    np.testing.assert_allclose(state_end[0], cube_states[-1], atol=1e-3)

    # replay by env states: restore an intermediate state exactly
    mid = {"actors": {"cube": cube_states[2][None]}}
    env2.unwrapped.set_state_dict(mid)
    got = np.asarray(env2.unwrapped.get_state_dict()["actors"]["cube"])
    np.testing.assert_allclose(got[0], cube_states[2], atol=1e-5)
    env2.close()
    env.close()
