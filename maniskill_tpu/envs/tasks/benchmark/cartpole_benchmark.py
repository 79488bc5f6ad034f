"""CartpoleBalanceBenchmark-v1 (counterpart of
mani_skill/examples/benchmarking/envs/maniskill/cartpole.py — the env behind
the reference's render-throughput table: RGB 128x128 @1024 envs = 32,138 fps
on RTX 4090)."""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ....sensors.camera import CameraConfig
from ....structs.types import SceneConfig, SimConfig
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ..control.cartpole import CartpoleEnv


@register_env("CartpoleBalanceBenchmark-v1", max_episode_steps=200000)
class CartpoleBalanceBenchmarkEnv(CartpoleEnv):
    SUPPORTED_REWARD_MODES = ("none",)

    def __init__(self, *args, camera_width=128, camera_height=128, num_cameras=1, **kwargs):
        self.camera_width = camera_width
        self.camera_height = camera_height
        self.num_cameras = num_cameras
        kwargs.setdefault("reward_mode", "none")
        super().__init__(*args, **kwargs)

    @property
    def _default_sim_config(self):
        return SimConfig(
            sim_freq=120, control_freq=60,
            scene_config=SceneConfig(solver_position_iterations=4),
        )

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0, -4, 1], target=[0, 0, 1])
        return [
            CameraConfig(
                f"base_camera_{i}", pose, self.camera_width, self.camera_height,
                np.pi / 2, 0.01, 100,
            )
            for i in range(self.num_cameras or 0)
        ]

    def _initialize_episode(self, env_idx, options: dict):
        rng = self._batched_episode_rng
        q0 = rng.uniform(-0.1, 0.1)
        q1 = rng.uniform(-0.034, 0.034)
        self.agent.robot.set_qpos(jnp.stack([q0, q1], axis=-1))
        self.agent.robot.set_qvel(rng.normal(0.0, 0.01, size=(2,)))
        self.agent.controller.reset()

    def evaluate(self):
        return {}

    def compute_dense_reward(self, obs, action, info):
        return jnp.zeros(self.num_envs, jnp.float32)
