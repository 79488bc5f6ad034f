"""Stable-Baselines3 VecEnv adapter (counterpart of
mani_skill/vector/wrappers/sb3.py:30-138): numpy in/out, per-env info dicts."""
from __future__ import annotations

from typing import List, Optional

import numpy as np

from ..utils import common


class ManiSkillSB3VectorEnv:
    """Duck-typed sb3 VecEnv over a batched ManiSkill env."""

    def __init__(self, env):
        self._env = env
        base = env.unwrapped
        self.num_envs = base.num_envs
        self.observation_space = base.single_observation_space
        self.action_space = base.single_action_space
        self._actions = None

    def reset(self):
        obs, _ = self._env.reset()
        return common.to_numpy(obs)

    def step_async(self, actions: np.ndarray):
        self._actions = actions

    def step_wait(self):
        obs, rew, term, trunc, info = self._env.step(self._actions)
        obs = common.to_numpy(obs)
        rew = np.asarray(common.to_numpy(rew))
        term = np.asarray(common.to_numpy(term))
        trunc = np.asarray(common.to_numpy(trunc))
        dones = term | trunc
        infos: List[dict] = []
        flat = {
            k: np.asarray(common.to_numpy(v))
            for k, v in info.items()
            if not isinstance(v, dict)
        }
        for i in range(self.num_envs):
            d = {k: v[i] for k, v in flat.items() if np.ndim(v) > 0}
            d["TimeLimit.truncated"] = bool(trunc[i]) and not bool(term[i])
            infos.append(d)
        return obs, rew, dones, infos

    def step(self, actions):
        self.step_async(actions)
        return self.step_wait()

    def close(self):
        self._env.close()

    def get_attr(self, name, indices=None):
        return [getattr(self._env.unwrapped, name)] * self.num_envs

    def env_is_wrapped(self, wrapper_class, indices=None):
        return [False] * self.num_envs
