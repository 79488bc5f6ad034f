"""CPUGymWrapper (counterpart of mani_skill/utils/wrappers/gymnasium.py:10-103):
unbatches a num_envs==1 env to a plain numpy single-env gym interface."""
from __future__ import annotations

import gymnasium as gym
import numpy as np

from ..utils import common


class CPUGymWrapper(gym.Wrapper):
    def __init__(self, env, ignore_terminations: bool = False, record_metrics: bool = False):
        super().__init__(env)
        base = env.unwrapped
        assert base.num_envs == 1, "CPUGymWrapper requires num_envs=1"
        self.ignore_terminations = ignore_terminations
        self.record_metrics = record_metrics
        self.observation_space = base.single_observation_space
        self.action_space = base.single_action_space
        self._return = 0.0
        self._length = 0
        self._success_once = False
        self._fail_once = False

    def reset(self, *, seed=None, options=None):
        obs, info = self.env.reset(seed=seed, options=options)
        self._return, self._length = 0.0, 0
        self._success_once = self._fail_once = False
        return self._unbatch(obs), self._unbatch_info(info)

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        reward = float(np.asarray(reward).reshape(-1)[0])
        terminated = bool(np.asarray(terminated).reshape(-1)[0])
        truncated = bool(np.asarray(truncated).reshape(-1)[0])
        info = self._unbatch_info(info)
        if self.record_metrics:
            self._return += reward
            self._length += 1
            if info.get("success"):
                self._success_once = True
            if info.get("fail"):
                self._fail_once = True
            episode = dict(r=self._return, l=self._length)
            if "success" in info:
                episode["success_once"] = self._success_once
                episode["success_at_end"] = bool(info["success"])
            if "fail" in info:
                episode["fail_once"] = self._fail_once
                episode["fail_at_end"] = bool(info["fail"])
            info["episode"] = episode
        if self.ignore_terminations:
            terminated = False
        return self._unbatch(obs), reward, terminated, truncated, info

    def _unbatch(self, x):
        return common.unbatch(common.to_numpy(x))

    def _unbatch_info(self, info):
        out = {}
        for k, v in info.items():
            if isinstance(v, dict):
                out[k] = self._unbatch_info(v)
            else:
                arr = np.asarray(v)
                out[k] = arr.reshape(-1)[0] if arr.size == 1 else arr
        return out

    def render(self):
        out = self.env.render()
        if out is None:
            return None
        return np.asarray(common.unbatch(common.to_numpy(out)))
