"""PullCubeTool-v1 (counterpart of
mani_skill/envs/tasks/tabletop/pull_cube_tool.py:19-280).

Semantics preserved: an L-shaped tool within arm reach must be used to pull
a cube that is out of reach; success = cube xy within 0.6 m of the robot
base; staged dense reward reach-tool -> grasp -> position-hook -> pull.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....building import actors
from ....sensors.camera import CameraConfig
from ....structs.pose import Pose
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....scene_builder.table import TableSceneBuilder
from ...base_env import BaseEnv


@register_env("PullCubeTool-v1", max_episode_steps=100)
class PullCubeToolEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]
    SUPPORTED_REWARD_MODES = ("normalized_dense", "dense", "sparse", "none")

    goal_radius = 0.3
    cube_half_size = 0.02
    handle_length = 0.2
    hook_length = 0.05
    width = 0.05
    height = 0.05
    cube_size = 0.02
    arm_reach = 0.35

    def __init__(self, *args, robot_uids="panda", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0, 0.5], target=[-0.1, 0, 0.1])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.6, 0.7, 0.6], [0.0, 0.0, 0.35])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.615, 0, 0, 1, 0, 0, 0]))

    def _build_l_shaped_tool(self):
        hl, hk, w, h = self.handle_length, self.hook_length, self.width, self.height
        b = self.scene.create_actor_builder()
        b.add_box_collision([hl / 2, 0, 0, 1, 0, 0, 0], [hl / 2, w / 2, h / 2], density=500)
        b.add_box_visual([hl / 2, 0, 0, 1, 0, 0, 0], [hl / 2, w / 2, h / 2], color=[1, 0, 0, 1])
        b.add_box_collision([hl - hk / 2, w, 0, 1, 0, 0, 0], [hk / 2, w, h / 2])
        b.add_box_visual([hl - hk / 2, w, 0, 1, 0, 0, 0], [hk / 2, w, h / 2], color=[1, 0, 0, 1])
        b.set_initial_pose([-0.2, -0.2, h / 2, 1, 0, 0, 0])
        return b.build(name="l_shape_tool")

    def _load_scene(self, options: dict):
        self.scene_builder = TableSceneBuilder(
            self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.scene_builder.build()
        self.cube = actors.build_cube(
            self.scene,
            half_size=self.cube_half_size,
            color=np.array([12, 42, 160, 255]) / 255,
            name="cube",
            initial_pose=np.array([0.3, 0, self.cube_size / 2, 1, 0, 0, 0]),
        )
        self.l_shape_tool = self._build_l_shaped_tool()

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.scene_builder.initialize(env_idx)
        rng = self._batched_episode_rng

        tool_xy = -rng.uniform(0.0, 0.2, (2,)) - 0.1
        tool_xyz = jnp.concatenate(
            [tool_xy, jnp.full((b, 1), self.height / 2, jnp.float32)], axis=-1
        )
        self.l_shape_tool.set_pose(Pose.create_from_pq(tool_xyz))

        cx = self.arm_reach + rng.uniform(0.0, self.handle_length) - 0.3
        cy = rng.uniform(0.0, 0.3) - 0.25
        cube_xyz = jnp.stack(
            [cx, cy, jnp.full((b,), self.cube_size / 2 + 0.015, jnp.float32)], axis=-1
        )
        from ...utils.randomization import random_quaternions

        cube_q = random_quaternions(
            rng, lock_x=True, lock_y=True, bounds=(-np.pi / 6, np.pi / 6)
        )
        self.cube.set_pose(Pose.create_from_pq(cube_xyz, cube_q))

    def _get_obs_extra(self, info: dict):
        obs = dict(tcp_pose=self.agent.tcp_pose.raw_pose)
        if "state" in self.obs_mode:
            obs.update(
                cube_pose=self.cube.pose.raw_pose,
                tool_pose=self.l_shape_tool.pose.raw_pose,
            )
        return obs

    def evaluate(self):
        cube_pos = self.cube.pose.p
        base_pos = self.agent.robot.links[0].pose.p
        cube_to_base_dist = jnp.linalg.norm(cube_pos[:, :2] - base_pos[:, :2], axis=1)
        cube_pulled_close = cube_to_base_dist < 0.6
        return {
            "success": cube_pulled_close,
        }

    def compute_dense_reward(self, obs, action, info):
        tcp_pos = self.agent.tcp_pose.p
        cube_pos = self.cube.pose.p
        tool_pos = self.l_shape_tool.pose.p
        base_pos = self.agent.robot.links[0].pose.p

        # stage 1: reach + grasp the tool handle
        tool_grasp_pos = tool_pos + jnp.asarray([0.02, 0, 0])
        tcp_to_tool = jnp.linalg.norm(tcp_pos - tool_grasp_pos, axis=1)
        reward = 2.0 * (1 - jnp.tanh(5.0 * tcp_to_tool))
        is_grasping = self.agent.is_grasping(self.l_shape_tool, max_angle=20).astype(
            jnp.float32
        )
        reward = reward + 2.0 * is_grasping

        # stage 2: hook behind the cube
        ideal_hook_pos = cube_pos + jnp.asarray(
            [-(self.hook_length + self.cube_half_size), -0.067, 0]
        )
        tool_positioning = jnp.linalg.norm(tool_pos - ideal_hook_pos, axis=1)
        reward = reward + 1.5 * (1 - jnp.tanh(3.0 * tool_positioning)) * is_grasping
        tool_positioned = (tool_positioning < 0.05).astype(jnp.float32)

        # stage 3: pull toward the workspace
        workspace_target = base_pos + jnp.asarray([0.05, 0, 0])
        cube_to_ws = jnp.linalg.norm(cube_pos - workspace_target, axis=1)
        initial = jnp.linalg.norm(
            jnp.asarray([self.arm_reach + 0.1, 0, self.cube_size / 2]) - workspace_target,
            axis=1,
        )
        pulling_progress = (initial - cube_to_ws) / jnp.maximum(initial, 1e-6)
        reward = reward + 3.0 * pulling_progress * tool_positioned * is_grasping

        reward = jnp.where(cube_pos[:, 0] > self.arm_reach + 0.15, reward - 2.0, reward)
        reward = jnp.where(info["success"], reward + 5.0, reward)
        return reward

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs=obs, action=action, info=info) / 5.0
