"""PickCube-v1 (counterpart of
mani_skill/envs/tasks/tabletop/pick_cube.py:49-191).

Semantics preserved: cube spawns in a square around a center with random
z-rotation; goal site floats up to max_goal_height above; success = cube
within goal_thresh of the goal AND the robot static; staged dense reward
reach -> grasp -> place -> still.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....building import actors
from ....sensors.camera import CameraConfig
from ....structs.pose import Pose
from ....structs.types import SimConfig
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....scene_builder.table import TableSceneBuilder
from ...base_env import BaseEnv


@register_env("PickCube-v1", max_episode_steps=50)
class PickCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]

    cube_half_size = 0.02
    goal_thresh = 0.025
    cube_spawn_half_size = 0.05
    cube_spawn_center = (0.0, 0.0)
    max_goal_height = 0.3

    def __init__(self, *args, robot_uids="panda", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0, 0.6], target=[-0.1, 0, 0.1])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.6, 0.7, 0.6], [0.0, 0.0, 0.35])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.615, 0, 0, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(
            self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()
        self.cube = actors.build_cube(
            self.scene,
            half_size=self.cube_half_size,
            color=[1, 0, 0, 1],
            name="cube",
            initial_pose=np.array([0, 0, self.cube_half_size, 1, 0, 0, 0]),
        )
        self.goal_site = actors.build_sphere(
            self.scene,
            radius=self.goal_thresh,
            color=[0, 1, 0, 1],
            name="goal_site",
            body_type="kinematic",
            add_collision=False,
            initial_pose=np.array([0, 0, 0, 1, 0, 0, 0]),
        )
        self._hidden_objects.append(self.goal_site)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        rng = self._batched_episode_rng
        xy = rng.uniform(-self.cube_spawn_half_size, self.cube_spawn_half_size, (2,))
        xy = xy + jnp.asarray(self.cube_spawn_center)
        xyz = jnp.concatenate(
            [xy, jnp.full((b, 1), self.cube_half_size, jnp.float32)], axis=-1
        )
        qs = rng.quaternions(lock_x=True, lock_y=True)
        self.cube.set_pose(Pose.create_from_pq(xyz, qs))

        gxy = rng.uniform(-self.cube_spawn_half_size, self.cube_spawn_half_size, (2,))
        gxy = gxy + jnp.asarray(self.cube_spawn_center)
        gz = rng.uniform(0.0, self.max_goal_height) + xyz[:, 2]
        goal_xyz = jnp.concatenate([gxy, gz[:, None]], axis=-1)
        self.goal_site.set_pose(Pose.create_from_pq(goal_xyz))

    def _get_obs_extra(self, info: dict):
        obs = dict(
            is_grasped=info["is_grasped"],
            tcp_pose=self.agent.tcp_pose.raw_pose,
            goal_pos=self.goal_site.pose.p,
        )
        if "state" in self.obs_mode:
            obs.update(
                obj_pose=self.cube.pose.raw_pose,
                tcp_to_obj_pos=self.cube.pose.p - self.agent.tcp_pose.p,
                obj_to_goal_pos=self.goal_site.pose.p - self.cube.pose.p,
            )
        return obs

    def evaluate(self):
        is_obj_placed = (
            jnp.linalg.norm(self.goal_site.pose.p - self.cube.pose.p, axis=1)
            <= self.goal_thresh
        )
        is_grasped = self.agent.is_grasping(self.cube)
        is_robot_static = self.agent.is_static(0.2)
        return {
            "success": is_obj_placed & is_robot_static,
            "is_obj_placed": is_obj_placed,
            "is_robot_static": is_robot_static,
            "is_grasped": is_grasped,
        }

    def compute_dense_reward(self, obs, action, info):
        tcp_to_obj_dist = jnp.linalg.norm(
            self.cube.pose.p - self.agent.tcp_pose.p, axis=1
        )
        reward = 1 - jnp.tanh(5 * tcp_to_obj_dist)

        is_grasped = info["is_grasped"].astype(jnp.float32)
        reward = reward + is_grasped

        obj_to_goal_dist = jnp.linalg.norm(
            self.goal_site.pose.p - self.cube.pose.p, axis=1
        )
        place_reward = 1 - jnp.tanh(5 * obj_to_goal_dist)
        reward = reward + place_reward * is_grasped

        qvel = self.agent.robot.qvel[..., :-2]
        static_reward = 1 - jnp.tanh(5 * jnp.linalg.norm(qvel, axis=1))
        reward = reward + static_reward * info["is_obj_placed"].astype(jnp.float32)

        reward = jnp.where(info["success"], 5.0, reward)
        return reward

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs=obs, action=action, info=info) / 5


@register_env("PickCubeSO100-v1", max_episode_steps=50)
class PickCubeSO100Env(PickCubeEnv):
    """PickCube with the SO100 arm (pick_cube.py:197-205)."""

    SUPPORTED_ROBOTS = ["so100"]

    def __init__(self, *args, **kwargs):
        kwargs.pop("robot_uids", None)
        super().__init__(*args, robot_uids="so100", **kwargs)

    def _load_agent(self, options: dict):
        BaseEnv._load_agent(self, options, np.array([-0.4, 0, 0, 1, 0, 0, 0]))


@register_env("PickCubeWidowXAI-v1", max_episode_steps=50)
class PickCubeWidowXAIEnv(PickCubeEnv):
    """PickCube with the WidowX-AI arm (pick_cube.py:208-214)."""

    SUPPORTED_ROBOTS = ["widowxai"]

    def __init__(self, *args, **kwargs):
        kwargs.pop("robot_uids", None)
        super().__init__(*args, robot_uids="widowxai", **kwargs)

    def _load_agent(self, options: dict):
        BaseEnv._load_agent(self, options, np.array([-0.45, 0, 0, 1, 0, 0, 0]))
