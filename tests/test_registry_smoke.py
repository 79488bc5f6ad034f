"""Whole-registry smoke test (reference test_gpu_envs.py:29-41 analog).

Gated behind MS_TEST_ALL=1 because every env pays a first-compile cost on a
fresh cache; the core suite smoke-tests representative envs instead.
"""
import os

import numpy as np
import jax.numpy as jnp
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.utils.registration import REGISTERED_ENVS, make

EXTENDED = bool(os.environ.get("MS_TEST_ALL"))
SLOW_OR_HUGE = {"FrankaMoveBenchmark-v1", "FrankaPickCubeBenchmark-v1",
                "CartpoleBalanceBenchmark-v1"}

ALL_IDS = sorted(set(REGISTERED_ENVS) - SLOW_OR_HUGE)
CORE_IDS = ["StackCube-v1", "MS-HopperStand-v1"]


@pytest.mark.parametrize("env_id", ALL_IDS if EXTENDED else CORE_IDS)
def test_registry_env_steps(env_id):
    env = make(env_id, num_envs=2)
    base = env.unwrapped
    obs, info = env.reset(seed=0)
    for _ in range(5):
        obs, rew, term, trunc, info = env.step(base.action_space.sample())
    assert rew.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(rew))), f"{env_id} produced non-finite rewards"
    state = base.get_state_dict()
    assert state  # sim-state dict exists for checkpointing
    env.close()
