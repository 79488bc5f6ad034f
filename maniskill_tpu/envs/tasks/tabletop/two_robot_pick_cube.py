"""TwoRobotPickCube-v1 (counterpart of
mani_skill/envs/tasks/tabletop/two_robot_pick_cube.py): two Panda arms must
cooperate — the cube spawns reachable only by the left arm, the goal is
reachable only by the right arm, so the left must hand the cube over.

Deviations: robots are plain Pandas (no wrist cams yet) placed facing each
other across the table; the dense reward is a compressed staging of the
reference's (reach -> grasp -> move to center -> right-arm pick -> place).
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


@register_env("TwoRobotPickCube-v1", max_episode_steps=100)
class TwoRobotPickCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = [("panda", "panda")]
    cube_half_size = 0.02
    goal_thresh = 0.025

    def __init__(
        self, *args, robot_uids=("panda", "panda"), robot_init_qpos_noise=0.02, **kwargs
    ):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at([1.0, 0, 0.75], [0.0, 0.0, 0.25])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([1.4, 0.8, 0.75], [0.0, 0.1, 0.1])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        # left robot at -y facing +y; right robot at +y facing -y
        yaw_pos = np.array([0, -0.75, 0, 0.7071068, 0, 0, 0.7071068])
        yaw_neg = np.array([0, 0.75, 0, 0.7071068, 0, 0, -0.7071068])
        super()._load_agent(options, initial_agent_poses=[yaw_pos, yaw_neg])

    @property
    def left_agent(self):
        return self.agent.agents[0]

    @property
    def right_agent(self):
        return self.agent.agents[1]

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(
            env=self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()
        self.cube = actors.build_cube(
            self.scene, half_size=self.cube_half_size, color=[1, 0, 0, 1],
            name="cube", initial_pose=np.array([0, -0.2, 0.02, 1, 0, 0, 0]),
        )
        self.goal_site = actors.build_sphere(
            self.scene, radius=self.goal_thresh, color=[0, 1, 0, 1],
            name="goal_site", body_type="kinematic", add_collision=False,
            initial_pose=np.array([0, 0.2, 0.2, 1, 0, 0, 0]),
        )
        self._hidden_objects.append(self.goal_site)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        rng = self._batched_episode_rng
        # cube on the left half (reachable by left robot only)
        x = rng.uniform(-0.05, 0.05)
        y = -0.15 - rng.uniform(0.0, 0.1) + 0.05
        xyz = jnp.stack([x, y, jnp.full((b,), self.cube_half_size, jnp.float32)], axis=-1)
        qs = rng.quaternions(lock_x=True, lock_y=True)
        self.cube.set_pose(Pose.create_from_pq(xyz, qs))
        # goal in the air on the right half
        gx = rng.uniform(-0.05, 0.05)
        gy = 0.1 + rng.uniform(0.0, 0.1)
        gz = rng.uniform(0.15, 0.35)
        goal = jnp.stack([gx, gy, gz], axis=-1)
        self.goal_site.set_pose(Pose.create_from_pq(goal))

    def evaluate(self):
        is_placed = (
            jnp.linalg.norm(self.goal_site.pose.p - self.cube.pose.p, axis=1)
            <= self.goal_thresh
        )
        is_static = self.right_agent.is_static(0.2)
        return {
            "success": is_placed & is_static,
            "is_obj_placed": is_placed,
        }

    def _get_obs_extra(self, info: dict):
        obs = dict(
            left_tcp_pose=self.left_agent.tcp.pose.raw_pose,
            right_tcp_pose=self.right_agent.tcp.pose.raw_pose,
            goal_pos=self.goal_site.pose.p,
        )
        if self.obs_mode_struct["use_state"]:
            obs.update(
                cube_pose=self.cube.pose.raw_pose,
                left_tcp_to_cube=self.cube.pose.p - self.left_agent.tcp.pose.p,
                right_tcp_to_cube=self.cube.pose.p - self.right_agent.tcp.pose.p,
                cube_to_goal=self.goal_site.pose.p - self.cube.pose.p,
            )
        return obs

    def compute_dense_reward(self, obs, action, info):
        cube_p = self.cube.pose.p
        # stage 1: left arm reaches cube
        l_dist = jnp.linalg.norm(cube_p - self.left_agent.tcp.pose.p, axis=1)
        reward = 1 - jnp.tanh(5 * l_dist)
        # stage 2: cube moves toward the center/right (handoff)
        progress = jnp.clip((cube_p[:, 1] + 0.2) / 0.4, 0.0, 1.0)
        reward = reward + progress
        # stage 3: right arm reaches cube once it is on the right half
        r_dist = jnp.linalg.norm(cube_p - self.right_agent.tcp.pose.p, axis=1)
        right_side = cube_p[:, 1] > 0.0
        reward = reward + (1 - jnp.tanh(5 * r_dist)) * right_side
        # stage 4: cube to goal
        goal_dist = jnp.linalg.norm(self.goal_site.pose.p - cube_p, axis=1)
        reward = reward + (1 - jnp.tanh(5 * goal_dist)) * right_side
        return jnp.where(info["success"], 6.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 6.0
