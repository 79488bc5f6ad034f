"""Sim2RealEnv tests with a mock real agent (counterpart scope of the
reference's sim2real alignment layer, mani_skill/envs/sim2real_env.py).

The mock BaseRealAgent mirrors the sim robot state + oversized camera
images, so the test exercises: identical obs/action spaces, the controller
action -> target-qpos mirror path, and the center-crop + resize sensor
preprocessing.
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
            self._qpos = np.asarray(qpos, np.float32)[: self.dof]

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
        img = np.arange(480 * 640 * 3, dtype=np.uint8).reshape(480, 640, 3)
        return {"base_camera": {"rgb": img}}


def test_center_crop_resize():
    img = np.zeros((480, 640, 3), np.uint8)
    out = _center_crop_resize(img, 128, 128)
    assert out.shape == (128, 128, 3)


def test_sim2real_state_obs_roundtrip():
    sim_env = make("PushCube-v1", num_envs=1, obs_mode="state")
    agent = MockRealAgent(dof=9)
    env = Sim2RealEnv(sim_env, agent, real_reset_function=lambda e: None)
    assert env.action_space.shape == sim_env.unwrapped.single_action_space.shape
    obs, info = env.reset(seed=0)
    act = np.zeros(env.action_space.shape, np.float32)
    obs2, rew, term, trunc, info = env.step(act)
    # the mirror path commanded the real robot once per step
    assert len(agent.commanded) == 1
    assert np.isfinite(np.asarray(obs2)).all()
    env.close()
    assert agent.stopped
    sim_env.close()


def test_sim2real_sensor_preprocessing():
    sim_env = make("PushCube-v1", num_envs=1, obs_mode="rgb")
    agent = MockRealAgent(dof=9)
    env = Sim2RealEnv(sim_env, agent, real_reset_function=lambda e: None)
    obs, _ = env.reset(seed=0)
    rgb = obs["sensor_data"]["base_camera"]["rgb"]
    # real 480x640 image resized to the sim camera's 128x128
    assert rgb.shape[:2] == (128, 128)
    env.close()
    sim_env.close()
