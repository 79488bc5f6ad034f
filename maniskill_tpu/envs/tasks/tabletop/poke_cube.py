"""PokeCube-v1 (counterpart of mani_skill/envs/tasks/tabletop/poke_cube.py):
grasp a peg and use it to poke a cube onto a goal region."""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....building import actors
from ....sensors.camera import CameraConfig
from ....structs.pose import Pose
from ....utils.geometry import rotation_conversions as rc
from ....utils.geometry.rotation_conversions import euler2quat
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....scene_builder.table import TableSceneBuilder
from ...base_env import BaseEnv


@register_env("PokeCube-v1", max_episode_steps=50)
class PokeCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]
    cube_half_size = 0.02
    peg_half_width = 0.025
    peg_half_length = 0.12
    goal_radius = 0.05

    def __init__(self, *args, robot_uids="panda", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0, 0.6], target=[-0.1, 0, 0.1])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.6, 0.7, 0.6], [0.2, 0.2, 0.35])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.615, 0, 0, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(
            self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()
        self.cube = actors.build_cube(
            self.scene, half_size=self.cube_half_size, color=[1, 0, 0, 1],
            name="cube", body_type="dynamic",
            initial_pose=np.array([0.3, 0, self.cube_half_size, 1, 0, 0, 0]),
        )
        self.peg = actors.build_twocolor_peg(
            self.scene, length=self.peg_half_length, width=self.peg_half_width,
            color_1=np.array([12, 42, 160, 255]) / 255,
            color_2=np.array([12, 42, 160, 255]) / 255,
            name="peg", body_type="dynamic",
            initial_pose=np.array([0, 0, self.peg_half_width, 1, 0, 0, 0]),
        )
        self.goal_region = actors.build_red_white_target(
            self.scene, radius=self.goal_radius, thickness=1e-5,
            name="goal_region", add_collision=False, body_type="kinematic",
            initial_pose=np.array([0, 0, 1e-3, 1, 0, 0, 0]),
        )
        self.peg_head_offset = jnp.asarray([self.peg_half_length, 0, 0])

    @property
    def peg_head_pos(self):
        return self.peg.pose.p + rc.quaternion_apply(
            self.peg.pose.q, self.peg_head_offset
        )

    @property
    def peg_head_pose(self):
        return self.peg.pose * Pose.create_from_pq(p=self.peg_head_offset)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        rng = self._batched_episode_rng
        peg_xy = rng.uniform(-0.1, 0.1, (2,))
        peg_xyz = jnp.concatenate(
            [peg_xy, jnp.full((b, 1), self.peg_half_width, jnp.float32)], axis=-1
        )
        self.peg.set_pose(Pose.create_from_pq(p=peg_xyz, q=[1, 0, 0, 0]))

        cube_y = rng.uniform(-0.1, 0.1)
        cube_x = peg_xyz[:, 0] + self.peg_half_length + 0.1
        cube_xyz = jnp.stack(
            [cube_x, cube_y, jnp.full((b,), self.cube_half_size, jnp.float32)], axis=-1
        )
        ang = rng.uniform(-np.pi / 6, np.pi / 6)
        zeros = jnp.zeros_like(ang)
        cube_q = rc.axis_angle_to_quaternion(jnp.stack([zeros, zeros, ang], axis=-1))
        self.cube.set_pose(Pose.create_from_pq(p=cube_xyz, q=cube_q))

        goal_xyz = cube_xyz + jnp.asarray([0.05 + self.goal_radius, 0, 0])
        goal_xyz = goal_xyz.at[..., 2].set(1e-3)
        self.goal_region.set_pose(
            Pose.create_from_pq(p=goal_xyz, q=euler2quat(0, np.pi / 2, 0))
        )

    def evaluate(self):
        is_cube_placed = (
            jnp.linalg.norm(
                self.cube.pose.p[..., :2] - self.goal_region.pose.p[..., :2], axis=1
            )
            < self.goal_radius
        )
        peg_euler = rc.matrix_to_euler_angles(
            rc.quaternion_to_matrix(self.peg_head_pose.q), "XYZ"
        )
        cube_euler = rc.matrix_to_euler_angles(
            rc.quaternion_to_matrix(self.cube.pose.q), "XYZ"
        )
        angle_diff = jnp.abs(peg_euler[:, 2] - cube_euler[:, 2])
        is_peg_cube_aligned = angle_diff < 0.05
        head_to_cube_dist = jnp.linalg.norm(
            self.peg_head_pos[..., :2] - self.cube.pose.p[..., :2], axis=1
        )
        is_peg_cube_close = head_to_cube_dist <= self.cube_half_size + 0.005
        is_peg_cube_fit = is_peg_cube_aligned & is_peg_cube_close
        is_peg_grasped = self.agent.is_grasping(self.peg)
        is_robot_static = self.agent.is_static(0.2)
        return {
            "success": is_cube_placed & is_robot_static,
            "is_cube_placed": is_cube_placed,
            "is_peg_cube_fit": is_peg_cube_fit,
            "is_peg_grasped": is_peg_grasped,
            "angle_diff": angle_diff,
            "head_to_cube_dist": head_to_cube_dist,
        }

    def _get_obs_extra(self, info: dict):
        obs = dict(tcp_pose=self.agent.tcp.pose.raw_pose)
        if self.obs_mode_struct["use_state"]:
            obs.update(
                cube_pose=self.cube.pose.raw_pose,
                peg_pose=self.peg.pose.raw_pose,
                goal_pos=self.goal_region.pose.p,
                tcp_to_peg_pos=self.peg.pose.p - self.agent.tcp.pose.p,
                peg_to_cube_pos=self.cube.pose.p - self.peg.pose.p,
                cube_to_goal_pos=self.goal_region.pose.p - self.cube.pose.p,
                peghead_to_cube_pos=self.peg_head_pos - self.cube.pose.p,
            )
        return obs

    def compute_dense_reward(self, obs, action, info):
        tcp_pos = self.agent.tcp.pose.p
        tcp_to_peg_dist = jnp.linalg.norm(tcp_pos - self.peg.pose.p, axis=1)
        reached = tcp_to_peg_dist < 0.01
        reward = 2 * (1 - jnp.tanh(5.0 * tcp_to_peg_dist))

        align_reward = 1 - jnp.tanh(5.0 * info["angle_diff"])
        close_reward = 1 - jnp.tanh(5.0 * info["head_to_cube_dist"])
        is_peg_grasped = info["is_peg_grasped"] & reached
        reward = jnp.where(is_peg_grasped, 4 + close_reward + align_reward, reward)

        cube_to_goal_dist = jnp.linalg.norm(
            self.goal_region.pose.p - self.cube.pose.p, axis=1
        )
        place_reward = 1 - jnp.tanh(5 * cube_to_goal_dist)
        is_fit = info["is_peg_cube_fit"] & is_peg_grasped
        reward = jnp.where(is_fit, 7 + place_reward, reward)

        static_reward = 1 - jnp.tanh(
            5 * jnp.linalg.norm(self.agent.robot.qvel[..., :-2], axis=1)
        )
        reward = reward + static_reward * info["is_cube_placed"]
        return jnp.where(info["success"], 10.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 10.0
