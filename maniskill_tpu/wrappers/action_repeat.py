"""ActionRepeat wrapper (counterpart of mani_skill/utils/wrappers/action_repeat.py:1-85):
repeats each action `repeat` times, accumulating rewards, stopping early for
envs that terminate (batched bookkeeping)."""
from __future__ import annotations

import gymnasium as gym
import jax.numpy as jnp


class ActionRepeatWrapper(gym.Wrapper):
    def __init__(self, env, repeat: int):
        super().__init__(env)
        self.repeat = repeat

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        total_reward = reward
        done = terminated | truncated
        for _ in range(self.repeat - 1):
            if bool(jnp.all(done)):
                break
            obs_i, r_i, term_i, trunc_i, info_i = self.env.step(action)
            total_reward = total_reward + jnp.where(done, 0.0, r_i)
            # only update outputs for envs that were still running
            keep = ~done
            obs = jnp.where(keep.reshape((-1,) + (1,) * (obs.ndim - 1)), obs_i, obs) if not isinstance(obs, dict) else obs_i
            terminated = terminated | term_i
            truncated = truncated | trunc_i
            info = info_i
            done = terminated | truncated
        return obs, total_reward, terminated, truncated, info
