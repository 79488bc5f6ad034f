"""Sim2RealEnv (counterpart of mani_skill/envs/sim2real_env.py:15-383).

Wraps a sim env + a BaseRealAgent so that a policy trained in sim runs on the
real robot with IDENTICAL obs/action spaces: actions go through the sim env's
controller scaling; real sensor images are center-cropped + resized to the
sim camera shapes; proprioception replaces the sim agent's.
"""
from __future__ import annotations

from typing import Dict, Optional

import gymnasium as gym
import numpy as np

from ..agents.base_real_agent import BaseRealAgent
from ..utils import common


def _center_crop_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    h, w = img.shape[:2]
    scale = max(out_h / h, out_w / w)
    ch, cw = int(out_h / scale), int(out_w / scale)
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    crop = img[y0 : y0 + ch, x0 : x0 + cw]
    # nearest-neighbor resize (no cv2 dependency)
    yi = (np.linspace(0, ch - 1, out_h)).astype(int)
    xi = (np.linspace(0, cw - 1, out_w)).astype(int)
    return crop[yi][:, xi]


class Sim2RealEnv(gym.Env):
    def __init__(
        self,
        sim_env,
        agent: BaseRealAgent,
        real_reset_function=None,
        obs_mode: Optional[str] = None,
        control_freq: Optional[int] = None,
    ):
        self.sim_env = sim_env
        self.base_sim_env = sim_env.unwrapped
        assert self.base_sim_env.num_envs == 1, "Sim2RealEnv requires num_envs=1"
        self.agent = agent
        self.real_reset_function = real_reset_function or self._default_reset

        self.observation_space = self.base_sim_env.single_observation_space
        self.action_space = self.base_sim_env.single_action_space
        self.control_freq = control_freq or self.base_sim_env.control_freq
        self._sim_sensor_shapes = {
            name: (cfg.height, cfg.width)
            for name, cfg in self.base_sim_env._sensor_configs.items()
        }
        self._elapsed = 0

    def _default_reset(self, env):
        input("press enter after resetting the real scene...")
        kf = getattr(self.base_sim_env.agent, "keyframes", {}).get("rest")
        if kf is not None and kf.qpos is not None:
            self.agent.reset(np.asarray(kf.qpos))

    # ------------------------------------------------------------------
    def reset(self, *, seed=None, options=None):
        self.sim_env.reset(seed=seed, options=options)
        self.real_reset_function(self)
        self._elapsed = 0
        return self.get_obs(), {}

    def step(self, action):
        # run the sim controller's action processing to get joint targets,
        # then mirror them onto the real robot
        ctrl = self.base_sim_env.agent.controller
        ctrl.set_action(common.to_tensor(action)[None] if np.ndim(action) == 1 else action)
        target = np.asarray(common.to_numpy(self.base_sim_env.scene.data.drive_target))[
            0, ctrl.controllers["arm"].dof_adrs if hasattr(ctrl, "controllers") else slice(None)
        ] if hasattr(ctrl, "controllers") else None
        qpos_target = np.asarray(
            common.to_numpy(self.base_sim_env.scene.data.drive_target)
        )[0]
        self.agent.set_target_qpos(qpos_target)
        self._elapsed += 1
        obs = self.get_obs()
        terminated = False
        truncated = self._elapsed >= (getattr(self.sim_env, "max_episode_steps", None) or 10**9)
        return obs, 0.0, terminated, truncated, {}

    def get_obs(self) -> Dict:
        obs = dict(agent=self.agent.get_proprioception(), extra={})
        if self.base_sim_env.obs_mode not in ("state", "state_dict", "none"):
            sensor_data = self.agent.get_sensor_data()
            processed = {}
            for name, data in sensor_data.items():
                target_shape = self._sim_sensor_shapes.get(name)
                out = {}
                for modality, img in data.items():
                    if target_shape is not None and img.ndim >= 2:
                        img = _center_crop_resize(img, *target_shape)
                    out[modality] = img
                processed[name] = out
            obs["sensor_data"] = processed
        if self.base_sim_env.obs_mode == "state":
            return common.flatten_state_dict(
                {k: common.batch(v) for k, v in obs["agent"].items()}
            )
        return obs

    def render(self):
        data = self.agent.get_sensor_data()
        if data:
            first = next(iter(data.values()))
            return first.get("rgb")
        return None

    def close(self):
        self.agent.stop()
