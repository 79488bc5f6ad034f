"""ManiSkillVectorEnv (counterpart of
mani_skill/vector/wrappers/gymnasium.py:18-199).

The env is already natively batched; this wrapper adds SAME_STEP auto-reset
via partial resets, final_observation/final_info bookkeeping, optional
infinite-horizon mode (ignore_terminations), and episode metrics.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Union

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import common, gym_utils


class ManiSkillVectorEnv(gym.vector.VectorEnv if hasattr(gym.vector, "VectorEnv") else object):
    def __init__(
        self,
        env: Union[gym.Env, str],
        num_envs: Optional[int] = None,
        auto_reset: bool = True,
        ignore_terminations: bool = False,
        record_metrics: bool = False,
        **kwargs,
    ):
        if isinstance(env, str):
            from ..utils.registration import make

            env = make(env, num_envs=num_envs or 1, **kwargs)
        self._env = env
        self.auto_reset = auto_reset
        self.ignore_terminations = ignore_terminations
        self.record_metrics = record_metrics

        base = env.unwrapped
        self.num_envs = base.num_envs
        self.single_action_space = base.single_action_space
        self.action_space = base.action_space
        self.single_observation_space = base.single_observation_space
        self.observation_space = base.observation_space
        self.max_episode_steps = gym_utils.find_max_episode_steps_value(env)

        if record_metrics:
            self.returns = jnp.zeros(self.num_envs, jnp.float32)
            self.lengths = jnp.zeros(self.num_envs, jnp.int32)
            self.success_once = jnp.zeros(self.num_envs, bool)
            self.fail_once = jnp.zeros(self.num_envs, bool)

    @property
    def env(self):
        return self._env

    @property
    def unwrapped(self):
        return self._env.unwrapped

    @property
    def base_env(self):
        return self._env.unwrapped

    def reset(self, *, seed=None, options=None):
        obs, info = self._env.reset(seed=seed, options=options or {})
        if self.record_metrics:
            mask = jnp.ones(self.num_envs, bool)
            if options and "env_idx" in options:
                mask = jnp.zeros(self.num_envs, bool).at[
                    jnp.asarray(options["env_idx"])
                ].set(True)
            self.returns = jnp.where(mask, 0.0, self.returns)
            self.lengths = jnp.where(mask, 0, self.lengths)
            self.success_once = jnp.where(mask, False, self.success_once)
            self.fail_once = jnp.where(mask, False, self.fail_once)
        return obs, info

    def step(self, actions):
        obs, reward, terminated, truncated, info = self._env.step(actions)

        if self.record_metrics:
            episode = {}
            self.returns = self.returns + reward
            self.lengths = self.lengths + 1
            episode["r"] = self.returns
            episode["l"] = self.lengths
            if "success" in info:
                self.success_once = self.success_once | info["success"]
                episode["success_once"] = self.success_once
                episode["success_at_end"] = info["success"]
            if "fail" in info:
                self.fail_once = self.fail_once | info["fail"]
                episode["fail_once"] = self.fail_once
                episode["fail_at_end"] = info["fail"]
            info["episode"] = episode

        if self.ignore_terminations:
            terminated = jnp.zeros_like(terminated)

        dones = terminated | truncated
        if self.auto_reset and bool(jnp.any(dones)):
            final_obs = obs
            final_info = info
            env_idx = np.nonzero(np.asarray(dones))[0]
            obs, _ = self.reset(options=dict(env_idx=env_idx))
            info = dict(info)
            info["final_observation"] = final_obs
            info["final_info"] = final_info
            info["_final_info"] = dones
            info["_elapsed_steps"] = final_info.get("elapsed_steps")
        return obs, reward, terminated, truncated, info

    def render(self):
        return self._env.render()

    def close(self):
        self._env.close()
