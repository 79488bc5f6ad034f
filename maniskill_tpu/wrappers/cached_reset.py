"""CachedResetWrapper (counterpart of
mani_skill/utils/wrappers/cached_reset.py:23-154): precomputes a pool of reset
states and restores them via ``reset_to_env_states`` for fast resets."""
from __future__ import annotations

from typing import Dict, Optional

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from ..utils import common


class CachedResetWrapper(gym.Wrapper):
    def __init__(self, env, num_resets: Optional[int] = None, seed: int = 0):
        super().__init__(env)
        base = env.unwrapped
        self.num_envs = base.num_envs
        self.num_resets = num_resets or base.num_envs
        self._seed = seed
        self._cache = None
        self._obs_cache = None
        self._rng = np.random.RandomState(seed)
        self._build_cache()

    def _build_cache(self):
        obs, _ = self.env.reset(seed=self._seed)
        base = self.env.unwrapped
        self._cache = common.to_numpy(base.get_state_dict())
        self._obs_cache = common.to_numpy(obs)

    def reset(self, *, seed=None, options=None):
        options = dict(options or {})
        if seed is not None or options.get("reconfigure", False):
            obs, info = self.env.reset(seed=seed, options=options)
            base = self.env.unwrapped
            self._cache = common.to_numpy(base.get_state_dict())
            return obs, info
        # sample cached states (here: identity permutation of the pooled batch)
        options["reset_to_env_states"] = jax.tree_util.tree_map(
            jnp.asarray, self._cache
        )
        return self.env.reset(options=options)
