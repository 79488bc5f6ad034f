"""VisualEncoderWrapper (counterpart of
mani_skill/utils/wrappers/visual_encoders.py:10-59).

The reference embeds RGB obs with a frozen torch R3M encoder; torch in the
jax hot path would force host round-trips, so the TPU-native stand-in is a
frozen randomly-initialized NatureCNN (fixed seed). Random convolutional
features are a documented-strong baseline for RL; swap in learned weights by
passing ``params``.
"""
from __future__ import annotations

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

import flax.linen as nn

from ..utils import gym_utils


class NatureCNN(nn.Module):
    out_dim: int = 256

    @nn.compact
    def __call__(self, x):  # x: (B, H, W, C) uint8
        x = x.astype(jnp.float32) / 255.0
        x = nn.relu(nn.Conv(32, (8, 8), strides=(4, 4))(x))
        x = nn.relu(nn.Conv(64, (4, 4), strides=(2, 2))(x))
        x = nn.relu(nn.Conv(64, (3, 3), strides=(1, 1))(x))
        x = x.reshape(x.shape[0], -1)
        return nn.relu(nn.Dense(self.out_dim)(x))


class VisualEncoderWrapper(gym.ObservationWrapper):
    def __init__(self, env, encoder: str = "frozen_cnn", out_dim: int = 256, params=None):
        super().__init__(env)
        base = env.unwrapped
        assert base.obs_mode not in ("state", "state_dict"), (
            "VisualEncoderWrapper needs a visual obs mode"
        )
        self.model = NatureCNN(out_dim)
        sample = base._init_raw_obs["sensor_data"]
        cam = next(iter(sample))
        rgb = sample[cam]["rgb"]
        self.params = params or self.model.init(jax.random.PRNGKey(0), rgb)
        self._encode = jax.jit(lambda p, x: self.model.apply(p, x))

        emb = self.observation(base._init_raw_obs)
        self.single_observation_space = gym_utils.convert_observation_to_space(emb)
        self.observation_space = gym_utils.batch_space(
            self.single_observation_space, base.num_envs
        )

    def observation(self, observation):
        obs = dict(observation)
        sensor_data = obs.pop("sensor_data")
        obs.pop("sensor_param", None)
        embeds = [
            self._encode(self.params, data["rgb"])
            for data in sensor_data.values()
            if "rgb" in data
        ]
        from ..utils.common import flatten_state_dict

        out = dict(embedding=jnp.concatenate(embeds, axis=-1))
        state = flatten_state_dict(obs)
        if state.size:
            out["state"] = state
        return out
