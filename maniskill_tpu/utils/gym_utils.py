"""Gym space helpers (counterpart of mani_skill/utils/gym_utils.py)."""
from __future__ import annotations

from typing import Any, Dict

import gymnasium as gym
import numpy as np
import jax


def convert_observation_to_space(obs: Any, unbatched: bool = True) -> gym.Space:
    """Derive a gym space from an example (batched) observation
    (gym_utils.py:129 parity)."""
    if isinstance(obs, dict):
        return gym.spaces.Dict(
            {k: convert_observation_to_space(v, unbatched) for k, v in obs.items()}
        )
    # only shape/dtype are needed — never transfer device data to host here
    if isinstance(obs, jax.Array):
        shape, dtype = tuple(obs.shape), np.dtype(obs.dtype)
    else:
        arr = np.asarray(obs)
        shape, dtype = arr.shape, arr.dtype
    shape = shape[1:] if unbatched else shape
    if dtype == np.bool_:
        return gym.spaces.Box(0, 1, shape, np.bool_)
    if np.issubdtype(dtype, np.integer):
        info = np.iinfo(dtype)
        return gym.spaces.Box(info.min, info.max, shape, dtype)
    return gym.spaces.Box(-np.inf, np.inf, shape, np.float32)


def batch_space(space: gym.Space, n: int) -> gym.Space:
    from gymnasium.vector.utils import batch_space as _bs

    return _bs(space, n)


def find_max_episode_steps_value(env) -> int:
    cur = env
    while cur is not None:
        if hasattr(cur, "max_episode_steps") and cur.max_episode_steps is not None:
            return cur.max_episode_steps
        cur = getattr(cur, "env", None)
    return None
