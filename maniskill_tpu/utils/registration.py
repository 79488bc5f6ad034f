"""Env registration (counterpart of mani_skill/utils/registration.py).

``@register_env`` registers tasks both in the framework registry and with
gymnasium (wrapped in a batched TimeLimit). ``max_episode_steps`` produces
batched truncation from elapsed_steps, mirroring registration.py:96-261.
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, Optional, Type

import gymnasium as gym
import numpy as np

REGISTERED_ENVS: Dict[str, "EnvSpec"] = {}


@dataclass
class EnvSpec:
    uid: str
    cls: Type
    max_episode_steps: Optional[int] = None
    default_kwargs: Optional[Dict[str, Any]] = None

    def make(self, **kwargs):
        merged = dict(self.default_kwargs or {})
        merged.update(kwargs)
        return self.cls(**merged)


def register(name: str, cls, max_episode_steps=None, default_kwargs=None):
    if name in REGISTERED_ENVS:
        return REGISTERED_ENVS[name]
    spec = EnvSpec(name, cls, max_episode_steps, default_kwargs)
    REGISTERED_ENVS[name] = spec
    return spec


def register_env(uid: str, max_episode_steps=None, override=False, **default_kwargs):
    """Class decorator mirroring the reference's @register_env."""

    def _register(cls):
        if uid in REGISTERED_ENVS and not override:
            raise ValueError(f"env {uid} already registered")
        REGISTERED_ENVS.pop(uid, None)
        register(uid, cls, max_episode_steps, default_kwargs)
        cls.uid = uid
        cls.max_episode_steps = max_episode_steps
        # also register with gymnasium for gym.make interop
        try:
            gym.register(
                id=uid,
                entry_point=partial(make, uid),
                disable_env_checker=True,
                order_enforce=False,
            )
        except gym.error.Error:
            pass
        return cls

    return _register


class TimeLimitWrapper(gym.Wrapper):
    """Batched truncation from elapsed_steps (registration.py:127 parity)."""

    def __init__(self, env, max_episode_steps: int):
        super().__init__(env)
        self._max_episode_steps = max_episode_steps

    @property
    def max_episode_steps(self):
        return self._max_episode_steps

    def step(self, action):
        obs, reward, terminated, truncated, info = self.env.step(action)
        elapsed = self.env.unwrapped.elapsed_steps
        truncated = truncated | (elapsed >= self._max_episode_steps)
        return obs, reward, terminated, truncated, info


def make(uid: str, **kwargs):
    """Create a registered env (with TimeLimit), mirroring EnvSpec.make."""
    if uid not in REGISTERED_ENVS:
        # allow "TaskName-v1" ids registered through gym by another module
        raise KeyError(f"env {uid} not registered; known: {sorted(REGISTERED_ENVS)}")
    spec = REGISTERED_ENVS[uid]
    env = spec.make(**kwargs)
    if spec.max_episode_steps is not None:
        env = TimeLimitWrapper(env, spec.max_episode_steps)
    return env
