"""Env-level integration tests (mirrors the reference's test strategy,
SURVEY.md §4: registry smoke, obs modes, determinism, state round-trip)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import maniskill_tpu.envs  # noqa: F401  (registers envs + robots)
from maniskill_tpu.utils.registration import REGISTERED_ENVS, make

SMOKE_ENV_IDS = ["PushCube-v1", "MS-CartpoleBalance-v1"]


def _rollout(env, n=3, zero=False):
    base = env.unwrapped
    obs, info = env.reset(seed=0)
    for _ in range(n):
        a = base.action_space.sample()
        if zero:
            a = a * 0
        obs, rew, term, trunc, info = env.step(a)
    return obs, rew, term, trunc, info


@pytest.mark.parametrize("env_id", SMOKE_ENV_IDS)
def test_env_smoke(env_id):
    env = make(env_id, num_envs=2)
    obs, rew, term, trunc, info = _rollout(env, 3)
    assert rew.shape == (2,)
    assert term.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(rew)))
    env.close()


def test_state_obs_finite():
    env = make("PushCube-v1", num_envs=2, obs_mode="state")
    obs, info = env.reset(seed=1)
    assert obs.ndim == 2 and obs.shape[0] == 2
    assert bool(jnp.all(jnp.isfinite(obs)))
    for _ in range(5):
        obs, rew, term, trunc, info = env.step(env.unwrapped.action_space.sample() * 0)
    assert bool(jnp.all(jnp.isfinite(obs)))
    env.close()


def test_state_dict_obs_structure():
    env = make("PushCube-v1", num_envs=2, obs_mode="state_dict")
    obs, _ = env.reset(seed=0)
    assert "agent" in obs and "extra" in obs
    assert obs["agent"]["qpos"].shape[0] == 2
    env.close()


def test_seeded_reset_deterministic():
    env = make("PushCube-v1", num_envs=2, obs_mode="state")
    obs1, _ = env.reset(seed=42)
    obs2, _ = env.reset(seed=42)
    np.testing.assert_allclose(np.asarray(obs1), np.asarray(obs2), atol=1e-6)
    obs3, _ = env.reset(seed=43)
    assert not np.allclose(np.asarray(obs1), np.asarray(obs3))
    env.close()


def test_partial_reset():
    env = make("PushCube-v1", num_envs=4, obs_mode="state")
    obs0, _ = env.reset(seed=0)
    base = env.unwrapped
    for _ in range(3):
        obs, *_ = env.step(base.action_space.sample())
    before = np.asarray(obs)
    obs2, _ = env.reset(options=dict(env_idx=[0, 2]))
    after = np.asarray(obs2)
    # envs 1 and 3 untouched
    np.testing.assert_allclose(after[1], before[1], atol=1e-5)
    np.testing.assert_allclose(after[3], before[3], atol=1e-5)
    env.close()


def test_sim_state_roundtrip():
    env = make("PushCube-v1", num_envs=2, obs_mode="state")
    env.reset(seed=5)
    base = env.unwrapped
    state = base.get_state_dict()
    assert state["actors"]["cube"].shape == (2, 13)
    obs_before = base.get_obs()
    for _ in range(3):
        env.step(base.action_space.sample())
    base.set_state_dict(state)
    obs_after = base.get_obs()
    np.testing.assert_allclose(
        np.asarray(obs_before), np.asarray(obs_after), atol=1e-4
    )
    env.close()


def test_elapsed_steps_and_truncation():
    env = make("MS-CartpoleBalance-v1", num_envs=2)
    env.reset(seed=0)
    base = env.unwrapped
    act = base.action_space.sample() * 0
    for i in range(3):
        obs, rew, term, trunc, info = env.step(act)
    assert np.all(np.asarray(base.elapsed_steps) == 3)
    env.close()


def test_vector_env_autoreset():
    from maniskill_tpu.vector import ManiSkillVectorEnv

    env = make("PushCube-v1", num_envs=2)
    venv = ManiSkillVectorEnv(env, auto_reset=True, record_metrics=True)
    obs, _ = venv.reset(seed=0)
    for _ in range(3):
        obs, rew, term, trunc, info = venv.step(venv.action_space.sample())
    assert "episode" in info
    assert info["episode"]["r"].shape == (2,)
    venv.close()


def test_humanoid_stand_basics():
    """21-dof humanoid: correct mass/height, finite obs, fail on fall."""
    env = make("MS-HumanoidStand-v1", num_envs=2)
    base = env.unwrapped
    obs, _ = env.reset(seed=0)
    masses = np.asarray(base.scene.model.body_mass)
    assert abs(float(masses[base._link_ids].sum()) - 40.8) < 1.0  # dm_control ~40kg
    assert np.allclose(np.asarray(base.head_height), 1.49, atol=0.02)
    act = np.zeros((2, 21), np.float32)
    obs, rew, term, trunc, info = env.step(act)
    assert np.all(np.asarray(rew) > 0.9)  # standing reward ~1 at rest
    assert bool(np.all(np.isfinite(np.asarray(obs))))
    env.close()


def test_rotate_in_hand_level3_smoke():
    """Level 3 uses per-env random YCB hulls (the import regression caught in
    round 4 made the env unconstructable); construct + step must work."""
    env = make("RotateSingleObjectInHandLevel3-v1", num_envs=2, obs_mode="state")
    obs, rew, term, trunc, info = _rollout(env, 2, zero=True)
    assert rew.shape == (2,)
    assert bool(jnp.all(jnp.isfinite(obs)))
    env.close()
