"""Sim2RealEnv (counterpart of mani_skill/envs/sim2real_env.py:15-383).

Runs a policy trained in sim on a physical robot while keeping the obs and
action contracts IDENTICAL to the simulation environment:

- actions go through the *sim* controller (set_action -> drive targets) and
  the resulting joint targets are mirrored onto the real robot, paced to the
  control frequency with wall-clock sleeps;
- the real robot's qpos is synced back into the sim scene every step (with a
  forward-kinematics pass), so engineered obs computed by the sim env's own
  ``_get_obs_extra`` (tcp poses etc.) reflect the physical robot;
- real sensor images are center-cropped to the sim camera aspect ratio and
  resized to the sim camera shapes;
- any gym wrappers applied to the sim env are replayed on the real env by
  temporarily swapping the innermost wrapper's ``.env`` with a shim whose
  step/reset drive the hardware (reference sim2real_env.py:104-205);
- on construction (unless ``skip_data_checks``) one sim reset and one real
  reset are compared recursively for shape/dtype alignment
  (reference sim2real_env.py:319-345).
"""
from __future__ import annotations

import time
from typing import Any, Callable, Dict, Optional

import gymnasium as gym
import numpy as np

from ..agents.base_real_agent import BaseRealAgent
from ..utils import common
from ..utils.logging_utils import logger


def _center_crop_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Crop to the target aspect ratio, then nearest-neighbor resize
    (reference preprocess_sensor_data uses cv2.resize; nearest keeps us
    dependency-free and is exact for integer down-scales)."""
    h, w = img.shape[:2]
    scale = max(out_h / h, out_w / w)
    ch, cw = max(1, round(out_h / scale)), max(1, round(out_w / scale))
    y0, x0 = (h - ch) // 2, (w - cw) // 2
    crop = img[y0 : y0 + ch, x0 : x0 + cw]
    yi = np.linspace(0, ch - 1, out_h).round().astype(int)
    xi = np.linspace(0, cw - 1, out_w).round().astype(int)
    return crop[yi][:, xi]


class _RealStepReset(gym.Env):
    """Shim handed to the sim env's wrapper chain: its step/reset drive the
    real hardware (reference RealEnvStepReset, sim2real_env.py:104-122)."""

    def __init__(self, owner: "Sim2RealEnv"):
        self._owner = owner

    def step(self, action):
        return self._owner._real_step(action)

    def reset(self, seed=None, options=None):
        return self._owner.get_obs(), {"reconfigure": False}

    def render(self):
        return self._owner.render()

    @property
    def unwrapped(self):
        return self._owner


class Sim2RealEnv(gym.Env):
    metadata = {"render_modes": ["rgb_array", "sensors", "all"]}

    def __init__(
        self,
        sim_env: gym.Env,
        agent: BaseRealAgent,
        real_reset_function: Optional[Callable] = None,
        sensor_data_preprocessing_function: Optional[Callable] = None,
        render_mode: Optional[str] = "sensors",
        skip_data_checks: bool = False,
        control_freq: Optional[int] = None,
    ):
        self.sim_env = sim_env
        self.base_sim_env = sim_env.unwrapped
        assert self.base_sim_env.num_envs == 1, "Sim2RealEnv requires num_envs=1"
        self.num_envs = 1
        self.agent = agent
        self.agent._sim_agent = self.base_sim_env.agent
        self.render_mode = render_mode

        # copied sim parameters
        self.sim_freq = self.base_sim_env.sim_freq
        self.control_freq = control_freq or self.base_sim_env.control_freq
        self.control_dt = 1.0 / self.control_freq
        self.last_control_time: Optional[float] = None
        self.obs_mode = self.base_sim_env.obs_mode
        self.reward_mode = self.base_sim_env.reward_mode

        # spaces come from the WRAPPED sim env so wrapper-transformed spaces
        # (flatten, frame stack, ...) match what the policy saw in training
        self.observation_space = self.sim_env.observation_space
        self.action_space = self.sim_env.action_space

        # wrapper chain replay (reference sim2real_env.py:124-136)
        wrappers = []
        cur = self.sim_env
        while isinstance(cur, gym.Wrapper):
            wrappers.append(cur)
            cur = cur.env
        self._handle_wrappers = len(wrappers) > 0
        if self._handle_wrappers:
            self._first_wrapper = wrappers[0]
            self._last_wrapper = wrappers[-1]
        self._shim = _RealStepReset(self)

        self._sim_sensor_shapes = {
            name: (cfg.height, cfg.width)
            for name, cfg in self.base_sim_env._sensor_configs.items()
        }
        self._elapsed_steps = np.zeros((1,), np.int32)

        def default_real_reset(self: "Sim2RealEnv", seed=None, options=None):
            self.sim_env.reset(seed=seed, options=options)
            self.agent.reset(
                np.asarray(self.base_sim_env.agent.robot.qpos).reshape(-1)
            )
            input("Press enter if the environment is reset")

        self.real_reset_function = real_reset_function or default_real_reset
        if sensor_data_preprocessing_function is not None:
            self.preprocess_sensor_data = sensor_data_preprocessing_function

        if not skip_data_checks:
            sample_sim_obs, _ = self.sim_env.reset()
            sample_real_obs, _ = self.reset()
            self._check_observations(sample_sim_obs, sample_real_obs)

    # ------------------------------------------------------------------
    @property
    def elapsed_steps(self):
        return self._elapsed_steps

    def _sync_sim_from_real(self):
        """Write the real robot's joint state into the sim scene (+FK pass)
        so sim-side derived quantities (tcp pose, obs extras, evaluate)
        reflect the hardware (reference syncs qpos after step/reset,
        sim2real_env.py:200-220)."""
        from ..physics import forward

        import jax.numpy as jnp

        base = self.base_sim_env
        qpos = np.asarray(self.agent.get_qpos(), np.float32).reshape(1, -1)
        robot = base.agent.robot
        data = base.scene.data
        adr = robot.q_adrs if hasattr(robot, "q_adrs") else None
        if adr is not None:
            new_qpos = data.qpos.at[:, adr].set(jnp.asarray(qpos))
        else:
            new_qpos = data.qpos.at[:, : qpos.shape[1]].set(jnp.asarray(qpos))
        base.scene.data = forward(base.scene.model, data.replace(qpos=new_qpos))

    def _step_action(self, action):
        """Sim controller -> drive targets -> real robot, paced to
        control_dt (reference sim2real_env.py:161-189)."""
        action = common.to_tensor(action)
        if np.ndim(action) == len(self.base_sim_env.single_action_space.shape):
            action = action[None]
        base = self.base_sim_env
        base.agent.set_action(action)
        ctrl = base.agent.controller

        if self.last_control_time is None:
            self.last_control_time = time.perf_counter()
        else:
            dt = time.perf_counter() - self.last_control_time
            if dt < self.control_dt:
                time.sleep(self.control_dt - dt)
            else:
                logger.warning(
                    f"Control dt {self.control_dt} was not reached, actual dt was {dt}"
                )
        self.last_control_time = time.perf_counter()

        data = base.scene.data
        if getattr(ctrl, "sets_target_qpos", True):
            self.agent.set_target_qpos(np.asarray(data.drive_target)[0])
        if getattr(ctrl, "sets_target_qvel", False):
            self.agent.set_target_qvel(np.asarray(data.drive_vel_target)[0])

    def _real_step(self, action):
        self._step_action(action)
        self._sync_sim_from_real()
        self._elapsed_steps = self._elapsed_steps + 1
        info = self.get_info()
        obs = self.get_obs(info)
        reward = self.get_reward(obs=obs, action=action, info=info)
        terminated = bool(np.asarray(info.get("success", False)).reshape(-1)[0])
        truncated = False
        return obs, reward, terminated, truncated, info

    # -- step/reset through the sim wrapper chain ----------------------
    def step(self, action):
        if self._handle_wrappers:
            orig = self._last_wrapper.env
            self._last_wrapper.env = self._shim
            try:
                ret = self._first_wrapper.step(action)
            finally:
                self._last_wrapper.env = orig
        else:
            ret = self._real_step(action)
        return ret

    def reset(self, *, seed=None, options=None):
        self.real_reset_function(self, seed, options)
        self._elapsed_steps[:] = 0
        self.last_control_time = None
        self._sync_sim_from_real()
        if self._handle_wrappers:
            orig = self._last_wrapper.env
            self._last_wrapper.env = self._shim
            try:
                ret = self._first_wrapper.reset(seed=seed, options=options)
            finally:
                self._last_wrapper.env = orig
        else:
            ret = self._shim.reset(seed=seed, options=options)
        ctrl = self.base_sim_env.agent.controller
        if hasattr(ctrl, "reset"):
            ctrl.reset()
        return ret

    # -- observations ---------------------------------------------------
    def get_obs(self, info: Optional[dict] = None) -> Any:
        if info is None:
            info = self.get_info()
        base = self.base_sim_env
        if base.obs_mode == "none":
            return {}
        agent_obs = {
            k: common.batch(np.asarray(v, np.float32))
            for k, v in self.agent.get_proprioception().items()
        }
        # target-based controllers expose their targets in proprioception;
        # the sim controller is the source of truth for both sim and real
        # (reference keeps agent._sim_agent.controller authoritative)
        ctrl_state = base.agent.controller.get_state()
        if ctrl_state and "controller" not in agent_obs:
            agent_obs["controller"] = ctrl_state
        # the sim env's OWN engineered features, computed on the synced
        # scene — same code path as training (reference _get_obs_extra
        # passthrough, sim2real_env.py:236-252)
        extra = base._get_obs_extra(info)
        state_dict = dict(agent=agent_obs, extra=extra)
        if base.obs_mode == "state":
            return common.flatten_state_dict(state_dict)
        if base.obs_mode == "state_dict":
            return state_dict
        state_dict["sensor_data"] = self._get_obs_sensor_data()
        state_dict["sensor_param"] = {
            name: sensor.get_params()
            for name, sensor in base._sensors.items()
        }
        return state_dict

    def _get_obs_sensor_data(self) -> Dict:
        if hasattr(self.agent, "capture_sensor_data"):
            self.agent.capture_sensor_data()
        data = self.agent.get_sensor_data()
        return self.preprocess_sensor_data(data)

    def preprocess_sensor_data(self, sensor_data: Dict) -> Dict:
        out = {}
        for name, modalities in sensor_data.items():
            shape = self._sim_sensor_shapes.get(name)
            proc = {}
            for mod, img in modalities.items():
                img = np.asarray(img)
                if shape is not None and img.ndim >= 2:
                    img = _center_crop_resize(img, *shape)
                proc[mod] = common.batch(img)
            out[name] = proc
        return out

    # -- info / rewards (sim env's own implementations on synced state) --
    def get_info(self):
        info = dict(self.base_sim_env.evaluate())
        info["elapsed_steps"] = self._elapsed_steps.copy()
        return info

    def get_reward(self, obs, action, info):
        if self.reward_mode in ("none",):
            return 0.0
        # sparse by default; dense rewards may reference sim-only state —
        # override to supply a real-world reward (reference
        # sim2real_env.py:295-315)
        if "success" in info:
            r = float(np.asarray(info["success"]).reshape(-1)[0])
            if "fail" in info:
                r -= float(np.asarray(info["fail"]).reshape(-1)[0])
            return r
        return 0.0

    # -- render ----------------------------------------------------------
    def render(self):
        data = self.agent.get_sensor_data()
        if not data:
            return None
        frames = [
            np.asarray(m["rgb"])
            for m in data.values()
            if "rgb" in m
        ]
        if not frames:
            return None
        if self.render_mode == "sensors" or self.render_mode == "all":
            return np.concatenate(frames, axis=1) if len(frames) > 1 else frames[0]
        return frames[0]

    # -- checks -----------------------------------------------------------
    def _check_observations(self, sample_sim_obs, sample_real_obs):
        """Recursive shape/dtype alignment between sim and real observations
        (reference sim2real_env.py:319-345)."""

        def check(sim_obs, real_obs, path=()):
            if isinstance(sim_obs, dict):
                for key in sim_obs:
                    if key not in real_obs:
                        raise KeyError(
                            "Key obs[\"%s\"] found in simulation observation "
                            "but not in real observation"
                            % ".".join(path + (key,))
                        )
                    check(sim_obs[key], real_obs[key], path + (key,))
            else:
                s = np.asarray(sim_obs)
                r = np.asarray(real_obs)
                assert s.shape == r.shape, (
                    f"Shape mismatch: obs[\"{'.'.join(path)}\"]: "
                    f"{s.shape} vs {r.shape}"
                )
                assert s.dtype == r.dtype, (
                    f"Dtype mismatch: obs[\"{'.'.join(path)}\"]: "
                    f"{s.dtype} vs {r.dtype}"
                )

        check(sample_sim_obs, sample_real_obs)

    def close(self):
        self.agent.stop()

    def __getattr__(self, name):
        # delegate anything else (task attrs, helper props) to the sim env
        return getattr(self.base_sim_env, name)
