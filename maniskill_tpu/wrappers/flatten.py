"""Flatten wrappers (counterpart of mani_skill/utils/wrappers/flatten.py:13-136)."""
from __future__ import annotations

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import common, gym_utils


class FlattenObservationWrapper(gym.ObservationWrapper):
    """Flatten nested dict obs into one (B, D) vector."""

    def __init__(self, env):
        super().__init__(env)
        sample = env.unwrapped._init_raw_obs
        flat = common.flatten_state_dict(sample)
        self.single_observation_space = gym.spaces.Box(
            -np.inf, np.inf, flat.shape[1:], np.float32
        )
        self.observation_space = gym_utils.batch_space(
            self.single_observation_space, env.unwrapped.num_envs
        )

    def observation(self, observation):
        return common.flatten_state_dict(observation)


class FlattenRGBDObservationWrapper(gym.ObservationWrapper):
    """Flatten obs into {state: (B,D), rgb: (B,H,W,3*k), depth: ...}
    (flatten.py:13-78 parity)."""

    def __init__(self, env, rgb=True, depth=True, state=True, sep_depth=True):
        super().__init__(env)
        self.include_rgb = rgb
        self.include_depth = depth
        self.include_state = state
        self.sep_depth = sep_depth
        sample = self.observation(env.unwrapped._init_raw_obs)
        self.single_observation_space = gym_utils.convert_observation_to_space(sample)
        self.observation_space = gym_utils.batch_space(
            self.single_observation_space, env.unwrapped.num_envs
        )

    def observation(self, observation):
        obs = dict(observation)
        sensor_data = obs.pop("sensor_data", {})
        obs.pop("sensor_param", None)
        out = {}
        rgbs, depths = [], []
        for cam, data in sensor_data.items():
            if self.include_rgb and "rgb" in data:
                rgbs.append(data["rgb"])
            if self.include_depth and "depth" in data:
                depths.append(data["depth"])
        if rgbs:
            out["rgb"] = jnp.concatenate(rgbs, axis=-1)
        if depths:
            if self.sep_depth:
                out["depth"] = jnp.concatenate(depths, axis=-1)
            elif rgbs:
                out["rgbd"] = jnp.concatenate(
                    [out.pop("rgb")] + depths, axis=-1
                )
        if self.include_state:
            out["state"] = common.flatten_state_dict(obs)
        return out


class FlattenActionSpaceWrapper(gym.ActionWrapper):
    """Flatten a Dict action space into one Box (flatten.py:98-136 parity)."""

    def __init__(self, env):
        super().__init__(env)
        base = env.unwrapped
        space = base.single_action_space
        if isinstance(space, gym.spaces.Dict):
            lows, highs = [], []
            self._mapping = {}
            start = 0
            for k, sub in space.spaces.items():
                n = sub.shape[0]
                lows.append(sub.low)
                highs.append(sub.high)
                self._mapping[k] = (start, start + n)
                start += n
            self.single_action_space = gym.spaces.Box(
                np.concatenate(lows), np.concatenate(highs), dtype=np.float32
            )
        else:
            self._mapping = None
            self.single_action_space = space
        self.action_space = gym_utils.batch_space(
            self.single_action_space, base.num_envs
        )

    def action(self, action):
        if self._mapping is None:
            return action
        return {k: action[..., lo:hi] for k, (lo, hi) in self._mapping.items()}
