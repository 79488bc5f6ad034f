"""BaseEnv: the Gymnasium environment core.

Counterpart of mani_skill/envs/sapien_env.py (1,500 LoC). TPU-native
restructuring: the reconfigure lifecycle builds a static ``Model`` once; the
step and reset paths are pure functions compiled by XLA — controller action
processing, ``sim_steps_per_control`` physics substeps (``lax.scan``),
evaluation, observation, and reward all fuse into ONE program with zero
host↔device transfers (vs the reference's gpu_apply/gpu_fetch protocol,
sapien_env.py:1042-1132).

Everything is natively batched over num_envs; obs/reward/terminated come back
as jax arrays on device.
"""
from __future__ import annotations

import copy
from functools import partial
from typing import Any, Dict, List, Optional, Sequence, Union

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np

from .. import physics as phys
from ..agents.base_agent import BaseAgent, MultiAgent
from ..agents.registration import get_agent_class
from ..structs.pose import Pose
from ..structs.types import SimConfig, merge_sim_config
from ..utils import common, gym_utils
from .scene import ManiSkillScene
from .utils.randomization.batched_rng import BatchedRNG


class BaseEnv(gym.Env):
    """Batched robot-manipulation environment base class."""

    SUPPORTED_ROBOTS: Optional[List[str]] = None
    SUPPORTED_OBS_MODES = ("state", "state_dict", "none", "rgb", "depth",
                           "segmentation", "rgbd", "rgb+depth",
                           "rgb+depth+segmentation", "rgb+segmentation",
                           "depth+segmentation", "pointcloud")
    SUPPORTED_REWARD_MODES = ("normalized_dense", "dense", "sparse", "none")

    agent: Union[BaseAgent, MultiAgent]
    metadata = {"render_modes": ["human", "rgb_array", "sensors", "all"]}

    def __init__(
        self,
        num_envs: int = 1,
        obs_mode: Optional[str] = None,
        reward_mode: Optional[str] = None,
        control_mode: Optional[str] = None,
        render_mode: Optional[str] = None,
        robot_uids: Union[str, Sequence[str], None] = None,
        sim_config: Union[SimConfig, dict, None] = None,
        sensor_configs: Optional[dict] = None,
        human_render_camera_configs: Optional[dict] = None,
        enable_shadow: bool = False,
        sim_backend: str = "auto",
        render_backend: str = "auto",
        parallel_in_single_scene: bool = False,
        reconfiguration_freq: Optional[int] = None,
        enhanced_determinism: bool = False,
        **kwargs,
    ):
        self.num_envs = num_envs
        self.obs_mode = obs_mode or "state"
        self.reward_mode = reward_mode or self.SUPPORTED_REWARD_MODES[0]
        self.render_mode = render_mode
        self._control_mode = control_mode
        self.robot_uids = robot_uids
        self._enable_shadow = enable_shadow
        self._sensor_config_overrides = sensor_configs or {}
        self._human_render_camera_config_overrides = human_render_camera_configs or {}
        self.reconfiguration_freq = reconfiguration_freq or 0
        self._reconfig_counter = 0

        # arbitrary "+"-combos of visual modalities are valid obs modes
        # (sapien_env.py:124-127 parity), e.g. "rgb+normal+albedo"
        _known = {"rgb", "depth", "segmentation", "position", "normal",
                  "albedo", "state"}
        _parts = set(self.obs_mode.split("+"))
        if self.obs_mode not in self.SUPPORTED_OBS_MODES and not (
            _parts and _parts <= _known
        ):
            raise ValueError(f"unsupported obs mode {self.obs_mode}")
        if self.reward_mode not in self.SUPPORTED_REWARD_MODES:
            raise ValueError(f"unsupported reward mode {self.reward_mode}")

        self.sim_config = merge_sim_config(self._default_sim_config, sim_config)
        self.sim_freq = self.sim_config.sim_freq
        self.control_freq = self.sim_config.control_freq
        if self.sim_freq % self.control_freq != 0:
            raise ValueError("sim_freq must be a multiple of control_freq")
        self.device = jax.devices()[0]

        self._hidden_objects: List = []
        self._elapsed_steps = jnp.zeros(num_envs, jnp.int32)
        self._main_seed: Optional[List[int]] = None
        self._episode_seeds = np.zeros(num_envs, np.int64)
        self._main_rng: Optional[np.random.RandomState] = None

        # ---- reconfigure: build the scene once ----
        self._reconfigure()

        # spaces (robot-free envs get an empty action space)
        if getattr(self, "agent", None) is not None:
            self.single_action_space = self.agent.single_action_space
        else:
            import gymnasium as _gym

            self.single_action_space = _gym.spaces.Box(-1.0, 1.0, (0,), np.float32)
        self.action_space = gym_utils.batch_space(self.single_action_space, num_envs)

        # first reset to derive observation space (sapien_env.py:327-345)
        obs, _ = self.reset(seed=2022, options=dict(reconfigure=False))
        self._init_raw_obs = obs
        self.single_observation_space = gym_utils.convert_observation_to_space(obs)
        self.observation_space = gym_utils.batch_space(
            self.single_observation_space, num_envs
        )

    # ==================================================================
    # configuration properties (overridden by tasks)
    # ==================================================================
    @property
    def _default_sim_config(self) -> SimConfig:
        return SimConfig()

    @property
    def _default_sensor_configs(self):
        return []

    @property
    def _default_human_render_camera_configs(self):
        return []

    @property
    def control_mode(self):
        return self.agent.control_mode if getattr(self, "agent", None) is not None else None

    @property
    def elapsed_steps(self):
        return self._elapsed_steps

    @property
    def obs_mode_struct(self):
        from .utils.observations import parse_obs_mode_to_struct

        return parse_obs_mode_to_struct(self.obs_mode)

    # ==================================================================
    # reconfigure lifecycle (sapien_env.py:725-853)
    # ==================================================================
    def _reconfigure(self, options: dict = {}):
        sc = self.sim_config.scene_config
        self.scene = ManiSkillScene(
            num_envs=self.num_envs,
            sim_timestep=1.0 / self.sim_freq,
            solver_iterations=sc.solver_position_iterations,
            gravity=sc.gravity,
        )
        self.scene.sim_steps_per_control = self.sim_config.sim_steps_per_control
        # scene-wide default material (reference physx.set_default_material,
        # sapien_env.py:267-275): builders pick this up for shapes that don't
        # override restitution
        self.scene.default_restitution = (
            self.sim_config.default_materials_config.restitution
        )
        self._load_agent(options)
        self._load_scene(options)
        self._load_lighting(options)
        model = self.scene.finalize()
        # contact solver params from config
        self.scene.model = model.replace(
            contact_slop=sc.contact_slop,
            baumgarte=sc.baumgarte,
            contact_margin=sc.contact_offset,
            bounce_threshold=sc.bounce_threshold,
        )
        if getattr(self, "agent", None) is not None:
            self.agent._setup_controllers()
        self._setup_sensors(options)
        self._after_reconfigure(options)
        self._prebuild_render_meshes()

        # initial data with builder poses applied
        self._data0 = self._make_initial_data()
        self.scene.bind(self._data0)
        # compiled functions (cleared so model changes re-trace)
        # donate the state pytree: step is the only consumer of the previous
        # data (scene.bind swaps in the returned one), so XLA can reuse the
        # HBM buffers in place instead of allocating a fresh copy per step
        self._step_compiled = jax.jit(self._step_impl, donate_argnums=(0,))
        self._reset_compiled = jax.jit(self._reset_impl)
        self._obs_compiled = jax.jit(self._obs_only_impl)

    def _make_initial_data(self) -> phys.Data:
        model = self.scene.model
        qpos0 = phys.default_qpos(model)
        mocap0 = None
        if model.mocap_bodies is not None:
            import numpy as _np

            mb = _np.asarray(model.mocap_bodies)
            # stay on device: model.body_pos/quat are jax arrays and pulling
            # them to host would make env construction synchronize (guarded
            # by tests/test_device_free_build.py)
            mocap0 = jnp.concatenate(
                [model.body_pos[mb], model.body_quat[mb]], axis=-1
            ).astype(jnp.float32)
        for actor in self.scene.actors.values():
            if actor.is_static or actor.initial_pose is None:
                continue
            if actor._mocap_idx is not None:
                mocap0 = mocap0.at[actor._mocap_idx].set(
                    jnp.asarray(actor.initial_pose, jnp.float32)
                )
                continue
            qa = int(model.body_q_adr[actor.body_id])
            qpos0[qa : qa + 7] = actor.initial_pose
        data = phys.make_data(model, self.num_envs, qpos0)
        if mocap0 is not None:
            data = data.replace(
                mocap_pose=jnp.broadcast_to(
                    jnp.asarray(mocap0), (self.num_envs,) + mocap0.shape
                )
            )
        specs = getattr(self.scene, "extra_specs", {})
        if specs:
            data = data.replace(
                extras={
                    name: jnp.zeros((self.num_envs,) + shape, dtype)
                    for name, (shape, dtype) in specs.items()
                }
            )
        return data

    def _load_agent(self, options: dict, initial_agent_poses=None, build_separate=False):
        robot_uids = self.robot_uids
        if robot_uids is None:
            return
        if not isinstance(robot_uids, (list, tuple)):
            robot_uids = [robot_uids]
            initial_agent_poses = [initial_agent_poses]
        agents = []
        for i, uid in enumerate(robot_uids):
            if isinstance(uid, type):
                cls = uid
            else:
                cls = get_agent_class(uid)
            pose = None
            if initial_agent_poses is not None and i < len(initial_agent_poses):
                pose = initial_agent_poses[i]
            agent = cls(
                self.scene,
                control_mode=self._control_mode,
                agent_idx=i if len(robot_uids) > 1 else None,
                initial_pose=pose,
            )
            agents.append(agent)
        self.agent = agents[0] if len(agents) == 1 else MultiAgent(agents)

    def _load_scene(self, options: dict):
        pass

    def _load_lighting(self, options: dict):
        self.scene.set_ambient_light([0.3, 0.3, 0.3])
        self.scene.add_directional_light([1, 1, -1], [1, 1, 1])
        self.scene.add_directional_light([0, 0, -1], [1, 1, 1])

    def _setup_sensors(self, options: dict):
        from ..sensors.camera import Camera, parse_camera_configs, update_camera_configs_from_dict

        self._sensors = {}
        configs = parse_camera_configs(self._default_sensor_configs)
        # agent-mounted sensors (e.g. wrist cameras), base_agent._sensor_configs
        agents = getattr(self.agent, "agents", [self.agent]) if self.robot_uids else []
        for ag in agents:
            ag_cfgs = parse_camera_configs(getattr(ag, "_sensor_configs", []))
            configs.update(ag_cfgs)
        update_camera_configs_from_dict(configs, self._sensor_config_overrides)
        self._sensor_configs = configs
        for name, cfg in configs.items():
            self._sensors[name] = Camera(cfg, self.scene)
        self.scene.sensors = self._sensors

        hr_configs = parse_camera_configs(self._default_human_render_camera_configs)
        update_camera_configs_from_dict(
            hr_configs, self._human_render_camera_config_overrides
        )
        self._human_render_cameras = {
            name: Camera(cfg, self.scene) for name, cfg in hr_configs.items()
        }
        self.scene.human_render_cameras = self._human_render_cameras

    def _before_control_step(self):
        """Task hook run before actions are applied each control step,
        inside the fused jit (traced ops only)."""

    def _after_control_step(self):
        """Task hook run after the physics substeps of each control step,
        inside the fused jit (traced ops only)."""

    def _after_reconfigure(self, options: dict):
        pass

    def _prebuild_render_meshes(self):
        """Build SceneMeshes eagerly: construction reads concrete model
        arrays, which inside the jit trace would be tracers."""
        hidden = tuple(self._hidden_objects)
        for sensor in self._sensors.values():
            if hasattr(sensor, "_get_mesh"):
                sensor._get_mesh(hidden)
        for cam in self._human_render_cameras.values():
            cam._get_mesh(())
            cam._get_mesh(hidden)

    # ==================================================================
    # reset (sapien_env.py:857-978)
    # ==================================================================
    def reset(self, seed=None, options=None):
        options = options or {}
        self._set_main_rng(seed)
        env_idx = options.get("env_idx", None)
        mask = np.zeros(self.num_envs, bool)
        if env_idx is None:
            mask[:] = True
        else:
            mask[np.asarray(env_idx)] = True

        # per-env episode seeds (two-level RNG, sapien_env.py:980-1016);
        # drawn BEFORE reconfigure so tasks that re-randomize geometry at
        # reconfiguration (PegInsertionSide, reference :76-83) sample it from
        # the fresh episode RNG. An explicit seed list/array sets the episode
        # seeds DIRECTLY so trajectory replay reproduces episodes (reference
        # reset-seed-list semantics)
        if isinstance(seed, (list, tuple, np.ndarray)):
            explicit = np.asarray(seed, np.int64).reshape(-1)
            if len(explicit) == int(mask.sum()):
                self._episode_seeds[mask] = explicit
            elif len(explicit) == self.num_envs:
                self._episode_seeds[mask] = explicit[mask]
            else:
                self._episode_seeds[mask] = np.resize(explicit, int(mask.sum()))
        elif seed is not None:
            base_seed = np.asarray(
                [seed + i for i in range(self.num_envs)], np.int64
            )
            self._episode_seeds[mask] = base_seed[mask]
        else:
            new_seeds = self._main_rng.randint(0, 2**31, size=int(mask.sum()))
            self._episode_seeds[mask] = new_seeds

        reconfigure = options.get("reconfigure", False)
        if self.reconfiguration_freq > 0 and env_idx is None:
            self._reconfig_counter += 1
            if self._reconfig_counter >= self.reconfiguration_freq:
                reconfigure = True
                self._reconfig_counter = 0
        if reconfigure:
            self._reconfigure(options)

        keys = jax.vmap(jax.random.PRNGKey)(jnp.asarray(self._episode_seeds))

        data = self.scene.data if self.scene.data is not None else self._data0
        mask_dev = jnp.asarray(mask)

        reset_state = options.get("reset_to_env_states", None)
        data, obs, info = self._reset_compiled(data, mask_dev, keys, reset_state)
        self.scene.bind(data)
        self._elapsed_steps = jnp.where(mask_dev, 0, self._elapsed_steps)
        return obs, info

    def _set_main_rng(self, seed):
        if seed is None:
            if self._main_rng is not None:
                return
            seed = np.random.RandomState().randint(2**31)
        if isinstance(seed, (list, tuple, np.ndarray)):
            seed = int(np.asarray(seed).reshape(-1)[0])
        self._main_seed = seed
        self._main_rng = np.random.RandomState(seed)

    def _reset_impl(self, data, mask, keys, reset_state):
        scene = self.scene
        scene.bind(data)
        scene._reset_mask = mask
        self._batched_episode_rng = BatchedRNG(keys)

        # clear velocities and forces for resetting envs (sapien_env.py:1023-1036)
        zeros = jnp.zeros_like(data.qvel)
        scene.data = data.replace(
            qvel=scene.masked(zeros, data.qvel),
            drive_target=scene.masked(jnp.zeros_like(data.drive_target), data.drive_target),
            drive_vel_target=scene.masked(
                jnp.zeros_like(data.drive_vel_target), data.drive_vel_target
            ),
            extras={
                k: scene.masked(jnp.zeros_like(v), v) for k, v in data.extras.items()
            },
        )

        if reset_state is not None:
            self.set_state_dict(reset_state)
        else:
            env_idx = jnp.arange(self.num_envs)
            self._initialize_episode(env_idx, {})

        # refresh kinematics (gpu_update_articulation_kinematics parity)
        scene.data = phys.forward(scene.model, scene.data)
        self.agent.controller.reset()
        scene._reset_mask = None

        info = self.get_info()
        obs = self.get_obs(info)
        return scene.data, obs, info

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        pass

    # ==================================================================
    # step (sapien_env.py:1042-1132)
    # ==================================================================
    def step(self, action):
        """Advance one control step.

        NOTE: the state pytree is DONATED to the compiled step
        (``donate_argnums=(0,)``), so any externally held reference to a
        previous ``env.scene.data`` (or arrays inside it) is invalidated by
        this call — re-read ``env.scene.data`` after each step instead of
        caching it across steps.
        """
        if isinstance(action, dict):
            ctrl = self.agent.controller
            if hasattr(ctrl, "action_mapping"):
                # flat Box over named sub-controllers: route through
                # from_action_dict (base_controller.py:336-347 parity)
                parts = {}
                for k, (lo, hi) in ctrl.action_mapping.items():
                    v = common.to_tensor(action[k], jnp.float32)
                    parts[k] = jnp.broadcast_to(v, (self.num_envs, hi - lo))
                action = ctrl.from_action_dict(parts)
            else:
                action = {
                    k: jnp.broadcast_to(
                        common.to_tensor(v, jnp.float32),
                        (self.num_envs,) + tuple(self.single_action_space[k].shape),
                    )
                    for k, v in action.items()
                }
        else:
            action = common.to_tensor(action, jnp.float32)
            if action.ndim == len(self.single_action_space.shape):
                action = jnp.broadcast_to(
                    action, (self.num_envs,) + tuple(self.single_action_space.shape)
                )
        data, obs, reward, terminated, info = self._step_compiled(
            self.scene.data, action
        )
        self.scene.bind(data)
        self._elapsed_steps = self._elapsed_steps + 1
        truncated = jnp.zeros(self.num_envs, bool)
        info = dict(info)
        info["elapsed_steps"] = self._elapsed_steps
        return obs, reward, terminated, truncated, info

    def _step_impl(self, data, action):
        scene = self.scene
        scene.bind(data)
        scene._reset_mask = None
        # pre-control-step task hook (sapien_env.py _before_control_step):
        # e.g. per-step camera-mount pose randomization in digital twins
        self._before_control_step()
        self.agent.set_action(action)

        model = scene.model
        n_sub = self.sim_config.sim_steps_per_control

        def substep(d, i):
            d = self.agent.before_simulation_step(d, i)
            d = phys.step(model, d)
            return d, None

        d, _ = jax.lax.scan(substep, scene.data, jnp.arange(n_sub))
        d = phys.forward_kinematics(model, d)
        scene.bind(d)
        # post-control-step task hook (sapien_env.py _after_control_step);
        # runs inside the fused jit — overrides mutate scene.data with traced
        # ops only
        self._after_control_step()

        info = self.get_info()
        obs = self.get_obs(info)
        reward = self.get_reward(obs=obs, action=action, info=info)
        terminated = self._get_terminated(info)
        return scene.data, obs, reward, terminated, info

    def _get_terminated(self, info: dict) -> jax.Array:
        success = info.get("success", None)
        fail = info.get("fail", None)
        if success is not None and fail is not None:
            return success | fail
        if success is not None:
            return success
        if fail is not None:
            return fail
        return jnp.zeros(self.num_envs, bool)

    # ==================================================================
    # observations (sapien_env.py:501-634)
    # ==================================================================
    def get_obs(self, info: Optional[dict] = None):
        if info is None:
            info = self.get_info()
        if self.obs_mode == "none":
            return {}
        if self.obs_mode == "state":
            return common.flatten_state_dict(self._get_obs_state_dict(info))
        if self.obs_mode == "state_dict":
            return self._get_obs_state_dict(info)
        return self._get_obs_with_sensor_data(info)

    def _get_obs_state_dict(self, info: dict):
        return dict(
            agent=self._get_obs_agent(),
            extra=self._get_obs_extra(info),
        )

    def _get_obs_agent(self):
        return self.agent.get_proprioception()

    def _get_obs_extra(self, info: dict):
        return {}

    def _get_obs_with_sensor_data(self, info: dict, apply_texture_transforms=True):
        from .utils.observations import parse_obs_mode_to_struct, sensor_data_to_pointcloud

        # hide marker objects (sapien_env.py:627-634): on TPU we simply skip
        # them in the render kernel via per-actor visibility flags
        struct = parse_obs_mode_to_struct(self.obs_mode)
        sensor_data = {}
        params = {}
        for name, sensor in self._sensors.items():
            sensor_data[name] = sensor.get_obs(
                rgb=struct["rgb"], depth=struct["depth"],
                segmentation=struct["segmentation"], position=struct["position"],
                normal=struct.get("normal", False),
                albedo=struct.get("albedo", False),
                apply_texture_transforms=apply_texture_transforms,
                hidden_actors=self._hidden_objects,
            )
            params[name] = sensor.get_params()
        obs = dict(
            agent=self._get_obs_agent(),
            extra=self._get_obs_extra(info),
            sensor_param=params,
            sensor_data=sensor_data,
        )
        if self.obs_mode == "pointcloud":
            obs = sensor_data_to_pointcloud(obs, self._sensors)
        return obs

    def _obs_only_impl(self, data):
        self.scene.bind(data)
        return self.get_obs()

    # ==================================================================
    # rewards (sapien_env.py:644-720)
    # ==================================================================
    def get_reward(self, obs, action, info):
        mode = self.reward_mode
        if mode == "none":
            return jnp.zeros(self.num_envs, jnp.float32)
        if mode == "sparse":
            return self.compute_sparse_reward(obs=obs, action=action, info=info)
        if mode == "dense":
            return self.compute_dense_reward(obs=obs, action=action, info=info)
        return self.compute_normalized_dense_reward(obs=obs, action=action, info=info)

    def compute_sparse_reward(self, obs, action, info):
        reward = jnp.zeros(self.num_envs, jnp.float32)
        if "success" in info:
            reward = reward + info["success"].astype(jnp.float32)
        if "fail" in info:
            reward = reward - info["fail"].astype(jnp.float32)
        return reward

    def compute_dense_reward(self, obs, action, info):
        raise NotImplementedError(
            f"{type(self).__name__} does not implement dense rewards"
        )

    def compute_normalized_dense_reward(self, obs, action, info):
        raise NotImplementedError(
            f"{type(self).__name__} does not implement normalized dense rewards"
        )

    # ==================================================================
    # info / evaluation
    # ==================================================================
    def get_info(self):
        return dict(self.evaluate())

    def evaluate(self) -> dict:
        return {}

    # ==================================================================
    # sim state checkpointing (sapien_env.py:1267-1325)
    # ==================================================================
    def get_state_dict(self) -> dict:
        state = self.scene.get_sim_state()
        ctrl = self.agent.controller.get_state()
        if ctrl:
            state["controller"] = ctrl
        return state

    def set_state_dict(self, state: dict):
        self.scene.set_sim_state(state)
        if "controller" in state:
            self.agent.controller.set_state(state["controller"])
        self.scene.data = phys.forward(self.scene.model, self.scene.data)

    def get_state(self) -> jax.Array:
        """Flat (B, D) state vector with fixed ordering."""
        return common.flatten_state_dict(
            {k: v for k, v in self.get_state_dict().items() if k != "controller"}
        )

    # ==================================================================
    # render
    # ==================================================================
    def render(self):
        if self.render_mode is None:
            raise RuntimeError("render_mode was not set")
        if self.render_mode == "rgb_array":
            return self.render_rgb_array()
        if self.render_mode == "sensors":
            return self.render_sensors()
        if self.render_mode == "all":
            import jax.numpy as _jnp

            return _jnp.concatenate(
                [self.render_rgb_array(), self.render_sensors()], axis=2
            )
        if self.render_mode == "human":
            # the reference opens a Vulkan viewer (sapien_utils.py:442);
            # headless TPU hosts get a matplotlib window when a display is
            # available, else the frame is returned (viewer-less parity)
            frame = self.render_rgb_array()
            try:
                import matplotlib

                if matplotlib.get_backend().lower() != "agg":
                    import matplotlib.pyplot as plt

                    if not hasattr(self, "_viewer_fig"):
                        plt.ion()
                        self._viewer_fig, self._viewer_ax = plt.subplots()
                        self._viewer_im = self._viewer_ax.imshow(
                            np.asarray(frame[0])
                        )
                        self._viewer_ax.axis("off")
                    else:
                        self._viewer_im.set_data(np.asarray(frame[0]))
                    self._viewer_fig.canvas.draw_idle()
                    plt.pause(0.001)
            except Exception:
                pass
            return frame
        raise NotImplementedError(self.render_mode)

    def render_rgb_array(self):
        # human render shows marker objects (only sensor captures hide them,
        # mirroring the reference's _hidden_objects semantics)
        imgs = []
        for cam in self._human_render_cameras.values():
            out = cam.get_obs(rgb=True, hidden_actors=())
            imgs.append(out["rgb"])
        if not imgs:
            return None
        return jnp.concatenate(imgs, axis=2) if len(imgs) > 1 else imgs[0]

    def render_sensors(self):
        imgs = []
        for sensor in self._sensors.values():
            out = sensor.get_obs(rgb=True, hidden_actors=self._hidden_objects)
            imgs.append(out["rgb"])
        if not imgs:
            return None
        return jnp.concatenate(imgs, axis=2) if len(imgs) > 1 else imgs[0]

    def close(self):
        pass

    # -- misc ------------------------------------------------------------
    @property
    def unwrapped(self):
        return self

    def print_sim_details(self):
        model = self.scene.model
        print(
            f"num_envs={self.num_envs} nbody={model.nbody} nq={model.nq} "
            f"nv={model.nv} ngeom={model.ngeom} npair={model.npair} "
            f"sim_freq={self.sim_freq} control_freq={self.control_freq}"
        )
