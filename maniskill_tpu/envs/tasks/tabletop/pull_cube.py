"""PullCube-v1 (counterpart of mani_skill/envs/tasks/tabletop/pull_cube.py):
pull the cube onto a target behind it (toward the robot)."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....building import actors
from ....sensors.camera import CameraConfig
from ....structs.pose import Pose
from ....utils.geometry.rotation_conversions import euler2quat
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....scene_builder.table import TableSceneBuilder
from ...base_env import BaseEnv


@register_env("PullCube-v1", max_episode_steps=50)
class PullCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]
    goal_radius = 0.1
    cube_half_size = 0.02

    def __init__(self, *args, robot_uids="panda", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[-0.5, 0.0, 0.25], target=[0.2, 0.0, -0.5])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.6, 0.7, 0.6], [0.0, 0.0, 0.35])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.615, 0, 0, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(
            env=self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()
        self.obj = actors.build_cube(
            self.scene, half_size=self.cube_half_size,
            color=np.array([12, 42, 160, 255]) / 255, name="cube",
            body_type="dynamic",
            initial_pose=np.array([0, 0, self.cube_half_size, 1, 0, 0, 0]),
        )
        self.goal_region = actors.build_red_white_target(
            self.scene, radius=self.goal_radius, thickness=1e-5,
            name="goal_region", add_collision=False, body_type="kinematic",
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
        target_xyz = xyz - jnp.asarray([0.1 + self.goal_radius, 0, 0])
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
        )
        return {"success": is_obj_placed}

    def _get_obs_extra(self, info: dict):
        obs = dict(
            tcp_pose=self.agent.tcp.pose.raw_pose,
            goal_pos=self.goal_region.pose.p,
        )
        if self.obs_mode_struct["use_state"]:
            obs.update(obj_pose=self.obj.pose.raw_pose)
        return obs

    def compute_dense_reward(self, obs, action, info):
        tcp_pull_pos = self.obj.pose.p + jnp.asarray(
            [self.cube_half_size + 2 * 0.005, 0, 0]
        )
        tcp_to_pull = tcp_pull_pos - self.agent.tcp.pose.p
        dist = jnp.linalg.norm(tcp_to_pull, axis=1)
        reward = 1 - jnp.tanh(5 * dist)
        reached = dist < 0.01
        obj_to_goal = jnp.linalg.norm(
            self.obj.pose.p[..., :2] - self.goal_region.pose.p[..., :2], axis=1
        )
        reward = reward + (1 - jnp.tanh(5 * obj_to_goal)) * reached
        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 3.0
