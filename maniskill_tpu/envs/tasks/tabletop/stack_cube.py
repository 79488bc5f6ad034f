"""StackCube-v1 (counterpart of mani_skill/envs/tasks/tabletop/stack_cube.py):
pick red cube A, stack it on green cube B, release."""
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


@register_env("StackCube-v1", max_episode_steps=50)
class StackCubeEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]
    cube_half_size = 0.02

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
            env=self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()
        self.cubeA = actors.build_cube(
            self.scene, half_size=0.02, color=[1, 0, 0, 1], name="cubeA",
            initial_pose=np.array([0, 0, 0.1, 1, 0, 0, 0]),
        )
        self.cubeB = actors.build_cube(
            self.scene, half_size=0.02, color=[0, 1, 0, 1], name="cubeB",
            initial_pose=np.array([0.08, 0, 0.1, 1, 0, 0, 0]),
        )

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        rng = self._batched_episode_rng
        base_xy = rng.uniform(-0.1, 0.1, (2,))
        # non-overlapping pair placement: sample B's offset direction and keep
        # it at least one cube diagonal away from A (rejection-free, batched)
        radius = float(np.linalg.norm([0.02, 0.02])) + 0.001
        angle = rng.uniform(0.0, 2 * np.pi)
        dist = rng.uniform(2 * radius, 0.16)
        offset = jnp.stack([jnp.cos(angle), jnp.sin(angle)], axis=-1) * dist[:, None]
        cubeA_xy = base_xy
        cubeB_xy = jnp.clip(base_xy + offset, -0.12, 0.12)

        z = jnp.full((b, 1), 0.02, jnp.float32)
        qa = rng.quaternions(lock_x=True, lock_y=True)
        self.cubeA.set_pose(
            Pose.create_from_pq(jnp.concatenate([cubeA_xy, z], axis=-1), qa)
        )
        qb = rng.quaternions(lock_x=True, lock_y=True)
        self.cubeB.set_pose(
            Pose.create_from_pq(jnp.concatenate([cubeB_xy, z], axis=-1), qb)
        )

    def evaluate(self):
        pos_A = self.cubeA.pose.p
        pos_B = self.cubeB.pose.p
        offset = pos_A - pos_B
        half = jnp.asarray([0.02, 0.02, 0.02])
        xy_flag = jnp.linalg.norm(offset[..., :2], axis=1) <= float(
            np.linalg.norm([0.02, 0.02])
        ) + 0.005
        z_flag = jnp.abs(offset[..., 2] - 0.04) <= 0.005
        is_cubeA_on_cubeB = xy_flag & z_flag
        is_cubeA_static = self.cubeA.is_static_check(lin_thresh=1e-2, ang_thresh=0.5)
        is_cubeA_grasped = self.agent.is_grasping(self.cubeA)
        success = is_cubeA_on_cubeB & is_cubeA_static & (~is_cubeA_grasped)
        return {
            "is_cubeA_grasped": is_cubeA_grasped,
            "is_cubeA_on_cubeB": is_cubeA_on_cubeB,
            "is_cubeA_static": is_cubeA_static,
            "success": success,
        }

    def _get_obs_extra(self, info: dict):
        obs = dict(tcp_pose=self.agent.tcp.pose.raw_pose)
        if "state" in self.obs_mode:
            obs.update(
                cubeA_pose=self.cubeA.pose.raw_pose,
                cubeB_pose=self.cubeB.pose.raw_pose,
                tcp_to_cubeA_pos=self.cubeA.pose.p - self.agent.tcp.pose.p,
                tcp_to_cubeB_pos=self.cubeB.pose.p - self.agent.tcp.pose.p,
                cubeA_to_cubeB_pos=self.cubeB.pose.p - self.cubeA.pose.p,
            )
        return obs

    def compute_dense_reward(self, obs, action, info):
        tcp_pose = self.agent.tcp.pose.p
        cubeA_pos = self.cubeA.pose.p
        cubeB_pos = self.cubeB.pose.p
        reward = 2 * (1 - jnp.tanh(5 * jnp.linalg.norm(tcp_pose - cubeA_pos, axis=1)))

        goal_xyz = jnp.concatenate(
            [cubeB_pos[:, :2], (cubeB_pos[:, 2] + 0.04)[:, None]], axis=-1
        )
        place_reward = 1 - jnp.tanh(
            5.0 * jnp.linalg.norm(goal_xyz - cubeA_pos, axis=1)
        )
        grasped = info["is_cubeA_grasped"]
        reward = jnp.where(grasped, 4 + place_reward, reward)

        gripper_width = 0.04 * 2
        ungrasp_reward = jnp.sum(self.agent.robot.qpos[:, -2:], axis=1) / gripper_width
        ungrasp_reward = jnp.where(~grasped, 1.0, ungrasp_reward)
        v = jnp.linalg.norm(self.cubeA.linear_velocity, axis=1)
        av = jnp.linalg.norm(self.cubeA.angular_velocity, axis=1)
        static_reward = 1 - jnp.tanh(v * 10 + av)
        reward = jnp.where(
            info["is_cubeA_on_cubeB"], 6 + (ungrasp_reward + static_reward) / 2.0, reward
        )
        return jnp.where(info["success"], 8.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 8.0
