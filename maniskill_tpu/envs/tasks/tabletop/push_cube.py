"""PushCube-v1 (counterpart of
mani_skill/envs/tasks/tabletop/push_cube.py:36-240).

Task semantics preserved: cube xy randomized in [-0.1, 0.1]^2, goal region at
cube + [0.1 + goal_radius, 0], success when cube xy within goal_radius of the
goal and still on the table; staged dense reward (reach -> place -> z-keep).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....building import actors
from ....sensors.camera import CameraConfig
from ....structs.pose import Pose
from ....structs.types import SimConfig
from ....utils import common
from ....utils.geometry.rotation_conversions import euler2quat
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....scene_builder.table import TableSceneBuilder
from ...base_env import BaseEnv


@register_env("PushCube-v1", max_episode_steps=50)
class PushCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]

    goal_radius = 0.1
    cube_half_size = 0.02

    def __init__(self, *args, robot_uids="panda", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sim_config(self):
        return SimConfig()

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0, 0.6], target=[-0.1, 0, 0.1])
        return [
            CameraConfig(
                "base_camera", pose=pose, width=128, height=128,
                fov=np.pi / 2, near=0.01, far=100,
            )
        ]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.6, 0.7, 0.6], [0.0, 0.0, 0.35])
        return CameraConfig(
            "render_camera", pose=pose, width=512, height=512, fov=1, near=0.01, far=100
        )

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.615, 0, 0, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(
            env=self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()

        self.obj = actors.build_cube(
            self.scene,
            half_size=self.cube_half_size,
            color=np.array([12, 42, 160, 255]) / 255,
            name="cube",
            body_type="dynamic",
            initial_pose=np.array([0, 0, self.cube_half_size, 1, 0, 0, 0]),
        )
        self.goal_region = actors.build_red_white_target(
            self.scene,
            radius=self.goal_radius,
            thickness=1e-5,
            name="goal_region",
            add_collision=False,
            body_type="kinematic",
            initial_pose=np.array([0, 0, 1e-3, 1, 0, 0, 0]),
        )

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)

        xy = self._batched_episode_rng.uniform(-0.1, 0.1, size=(2,))
        xyz = jnp.concatenate(
            [xy, jnp.full((b, 1), self.cube_half_size, jnp.float32)], axis=-1
        )
        self.obj.set_pose(Pose.create_from_pq(p=xyz, q=[1, 0, 0, 0]))

        target_xyz = xyz + jnp.asarray([0.1 + self.goal_radius, 0, 0])
        target_xyz = target_xyz.at[..., 2].set(1e-3)
        self.goal_region.set_pose(
            Pose.create_from_pq(p=target_xyz, q=euler2quat(0, np.pi / 2, 0))
        )

    def evaluate(self):
        is_obj_placed = (
            jnp.linalg.norm(
                self.obj.pose.p[..., :2] - self.goal_region.pose.p[..., :2], axis=1
            )
            < self.goal_radius
        ) & (self.obj.pose.p[..., 2] < self.cube_half_size + 5e-3)
        return {"success": is_obj_placed}

    def _get_obs_extra(self, info: dict):
        obs = dict(tcp_pose=self.agent.tcp.pose.raw_pose)
        if self.obs_mode_struct["use_state"]:
            obs.update(
                goal_pos=self.goal_region.pose.p,
                obj_pose=self.obj.pose.raw_pose,
            )
        return obs

    def compute_dense_reward(self, obs, action, info):
        tcp_push_p = self.obj.pose.p + jnp.asarray(
            [-self.cube_half_size - 0.005, 0, 0]
        )
        tcp_to_push = tcp_push_p - self.agent.tcp.pose.p
        tcp_to_push_dist = jnp.linalg.norm(tcp_to_push, axis=1)
        reaching_reward = 1 - jnp.tanh(5 * tcp_to_push_dist)
        reward = reaching_reward

        reached = tcp_to_push_dist < 0.01
        obj_to_goal_dist = jnp.linalg.norm(
            self.obj.pose.p[..., :2] - self.goal_region.pose.p[..., :2], axis=1
        )
        place_reward = 1 - jnp.tanh(5 * obj_to_goal_dist)
        reward = reward + place_reward * reached

        z_dev = jnp.abs(self.obj.pose.p[..., 2] - self.cube_half_size)
        z_reward = 1 - jnp.tanh(5 * z_dev)
        reward = reward + place_reward * z_reward * reached

        reward = jnp.where(info["success"], 3.0, reward)
        return reward

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 3.0
