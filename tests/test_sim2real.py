"""Sim2RealEnv tests with a mock real agent (counterpart scope of the
reference's sim2real alignment layer, mani_skill/envs/sim2real_env.py).

The mock BaseRealAgent mirrors the sim robot state + oversized camera
images, so the tests exercise: identical obs/action spaces, the automatic
sim-vs-real observation alignment check, the controller action ->
target-qpos mirror path, qpos sync back into the sim scene, wrapper-chain
replay on the real env, and the center-crop + resize sensor preprocessing.
"""
import numpy as np
import pytest

import maniskill_tpu.envs  # noqa: F401
from maniskill_tpu.agents.base_real_agent import BaseRealAgent
from maniskill_tpu.envs.sim2real_env import Sim2RealEnv, _center_crop_resize
from maniskill_tpu.utils.registration import make


class MockRealAgent(BaseRealAgent):
    """Echoes commanded targets as real qpos; serves 480x640 images."""

    def __init__(self, dof):
        super().__init__()
        self.dof = dof
        self._qpos = np.zeros(dof, np.float32)
        self.commanded = []
        self.stopped = False

    def start(self):
        pass

    def stop(self):
        self.stopped = True

    def reset(self, qpos=None):
        if qpos is not None:
            self._qpos = np.asarray(qpos, np.float32).reshape(-1)[: self.dof]

    def set_target_qpos(self, qpos):
        q = np.asarray(qpos, np.float32).reshape(-1)[: self.dof]
        self.commanded.append(q)
        self._qpos = q  # ideal tracking

    def get_qpos(self):
        return self._qpos

    def get_qvel(self):
        return np.zeros(self.dof, np.float32)

    def get_proprioception(self):
        return dict(qpos=self._qpos, qvel=self.get_qvel())

    def get_sensor_data(self):
        img = (np.arange(480 * 640 * 3) % 251).astype(np.uint8)
        return {"base_camera": {"rgb": img.reshape(480, 640, 3)}}


def _no_prompt_reset(env, seed=None, options=None):
    env.sim_env.reset(seed=seed, options=options)
    env.agent.reset(np.asarray(env.base_sim_env.agent.robot.qpos).reshape(-1))


def test_center_crop_resize():
    img = np.zeros((480, 640, 3), np.uint8)
    out = _center_crop_resize(img, 128, 128)
    assert out.shape == (128, 128, 3)


def test_sim2real_state_obs_roundtrip():
    sim_env = make("PushCube-v1", num_envs=1, obs_mode="state")
    agent = MockRealAgent(dof=9)
    # skip_data_checks=False: construction itself verifies the sim and real
    # observations align in shape and dtype (reference sim2real_env.py:319)
    env = Sim2RealEnv(sim_env, agent, real_reset_function=_no_prompt_reset)
    # the real env exposes the SAME (possibly batched) action space as the
    # sim env it mirrors (reference sim2real_env.py:95)
    assert env.action_space == sim_env.action_space
    obs, info = env.reset(seed=0)
    n0 = len(agent.commanded)
    # unbatched single-env action must broadcast, like BaseEnv.step
    act = np.zeros(sim_env.unwrapped.single_action_space.shape, np.float32)
    obs2, rew, term, trunc, info = env.step(act)
    # the mirror path commanded the real robot once per step
    assert len(agent.commanded) == n0 + 1
    assert np.isfinite(np.asarray(obs2)).all()
    env.close()
    assert agent.stopped
    sim_env.close()


def test_sim2real_qpos_sync_into_sim():
    """After a real step, the sim scene's robot qpos equals the real qpos
    (reference sim2real_env.py:200-220 sync contract)."""
    sim_env = make("PushCube-v1", num_envs=1, obs_mode="state")
    agent = MockRealAgent(dof=9)
    env = Sim2RealEnv(sim_env, agent, real_reset_function=_no_prompt_reset)
    env.reset(seed=0)
    act = np.full(env.action_space.shape, 0.3, np.float32)
    env.step(act)
    sim_qpos = np.asarray(sim_env.unwrapped.agent.robot.qpos).reshape(-1)
    np.testing.assert_allclose(sim_qpos, agent.get_qpos(), atol=1e-5)
    env.close()
    sim_env.close()


def test_sim2real_alignment_check_catches_mismatch():
    """A real agent with a wrong-dof proprioception fails construction."""
    sim_env = make("PushCube-v1", num_envs=1, obs_mode="state")
    agent = MockRealAgent(dof=7)  # sim robot has 9
    with pytest.raises(AssertionError):
        Sim2RealEnv(sim_env, agent, real_reset_function=_no_prompt_reset)
    sim_env.close()


def test_sim2real_wrapper_replay():
    """Gym wrappers applied to the sim env drive the real env too
    (reference RealEnvStepReset swap, sim2real_env.py:104-205)."""
    import gymnasium as gym

    class CountingWrapper(gym.Wrapper):
        def __init__(self, env):
            super().__init__(env)
            self.steps_seen = 0

        def step(self, action):
            self.steps_seen += 1
            return self.env.step(action)

    sim_env = CountingWrapper(make("PushCube-v1", num_envs=1, obs_mode="state"))
    agent = MockRealAgent(dof=9)
    env = Sim2RealEnv(sim_env, agent, real_reset_function=_no_prompt_reset)
    env.reset(seed=0)
    before = sim_env.steps_seen
    env.step(np.zeros(env.action_space.shape, np.float32))
    # the wrapper's step ran for the REAL step (not just sim steps)
    assert sim_env.steps_seen == before + 1
    env.close()


def test_sim2real_sensor_preprocessing():
    sim_env = make("PushCube-v1", num_envs=1, obs_mode="rgb")
    agent = MockRealAgent(dof=9)
    env = Sim2RealEnv(sim_env, agent, real_reset_function=_no_prompt_reset)
    obs, _ = env.reset(seed=0)
    rgb = np.asarray(obs["sensor_data"]["base_camera"]["rgb"])
    # real 480x640 image batched + resized to the sim camera's (1, 128, 128)
    assert rgb.shape[:3] == (1, 128, 128)
    env.close()
    sim_env.close()
