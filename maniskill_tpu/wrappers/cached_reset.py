"""CachedResetWrapper (counterpart of
mani_skill/utils/wrappers/cached_reset.py:23-154): precomputes a pool of reset
states and restores random samples from it via ``reset_to_env_states`` for
fast resets with preserved initial-state diversity."""
from __future__ import annotations

from typing import Optional

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
        self._pool = None
        self._rng = np.random.RandomState(seed)
        self._build_cache()

    def _build_cache(self):
        """Build a pool of ``num_resets`` initial states by running as many
        full resets as needed (each with a distinct seed) and concatenating
        their state dicts along the env axis."""
        base = self.env.unwrapped
        chunks = []
        n_have = 0
        i = 0
        while n_have < self.num_resets:
            self.env.reset(seed=self._seed + i)
            chunks.append(common.to_numpy(base.get_state_dict()))
            n_have += self.num_envs
            i += 1
        pool = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0)[: self.num_resets], *chunks
        )
        self._pool = pool

    def _sample_states(self):
        idx = self._rng.randint(0, self.num_resets, size=self.num_envs)
        return jax.tree_util.tree_map(lambda x: jnp.asarray(x[idx]), self._pool)

    def reset(self, *, seed=None, options=None):
        options = dict(options or {})
        if seed is not None or options.get("reconfigure", False):
            obs, info = self.env.reset(seed=seed, options=options)
            self._seed = seed if seed is not None else self._seed
            self._build_cache()
            return obs, info
        options["reset_to_env_states"] = self._sample_states()
        return self.env.reset(options=options)
