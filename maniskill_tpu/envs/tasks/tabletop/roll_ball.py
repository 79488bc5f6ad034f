"""RollBall-v1 (counterpart of mani_skill/envs/tasks/tabletop/roll_ball.py):
hit a ball so it rolls into a distant goal region.

The reference keeps a sticky per-env ``reached_status`` python tensor; here it
is a registered scene extra living inside the state pytree (functional,
reset-masked automatically).
"""
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


@register_env("RollBall-v1", max_episode_steps=80)
class RollBallEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]
    ball_radius = 0.035
    goal_radius = 0.1

    def __init__(self, *args, robot_uids="panda", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0, 0.6], target=[-0.1, 0, 0.1])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.6, 1.3, 0.8], [0.0, 0.13, 0.0])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        # robot faces the ball across the table (reference sets this root
        # pose every episode; it is constant, so bake it at load)
        super()._load_agent(
            options, np.array([-0.1, 1.0, 0, 0.7071, 0, 0, -0.7072])
        )

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(
            self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()
        self.ball = actors.build_sphere(
            self.scene, radius=self.ball_radius, color=[0, 0.2, 0.8, 1],
            name="ball", initial_pose=np.array([0, 0.5, 0.1, 1, 0, 0, 0]),
        )
        self.goal_region = actors.build_red_white_target(
            self.scene, radius=self.goal_radius, thickness=1e-5,
            name="goal_region", add_collision=False, body_type="kinematic",
            initial_pose=np.array([0, -0.8, 1e-3, 1, 0, 0, 0]),
        )
        self.scene.register_extra("reached_status")

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        rng = self._batched_episode_rng
        x = (rng.uniform(0.0, 1.0) * 2 - 1) * 0.3 - 0.1
        y = rng.uniform(0.0, 1.0) * 0.2 + 0.5
        xyz = jnp.stack([x, y, jnp.full((b,), self.ball_radius, jnp.float32)], axis=-1)
        self.ball.set_pose(Pose.create_from_pq(p=xyz, q=[1, 0, 0, 0]))

        gx = (rng.uniform(0.0, 1.0) * 2 - 1) * 0.3 - 0.1
        gy = rng.uniform(0.0, 1.0) * 0.2 - 1.0 + self.goal_radius
        goal = jnp.stack([gx, gy, jnp.full((b,), 1e-3, jnp.float32)], axis=-1)
        self.goal_region.set_pose(
            Pose.create_from_pq(p=goal, q=euler2quat(0, np.pi / 2, 0))
        )

    def evaluate(self):
        is_obj_placed = (
            jnp.linalg.norm(
                self.ball.pose.p[..., :2] - self.goal_region.pose.p[..., :2], axis=1
            )
            < self.goal_radius
        )
        return {"success": is_obj_placed}

    def _get_obs_extra(self, info: dict):
        obs = dict(tcp_pose=self.agent.tcp.pose.raw_pose)
        if self.obs_mode_struct["use_state"]:
            obs.update(
                goal_pos=self.goal_region.pose.p,
                ball_pose=self.ball.pose.raw_pose,
                ball_vel=self.ball.linear_velocity,
                tcp_to_ball_pos=self.ball.pose.p - self.agent.tcp.pose.p,
                ball_to_goal_pos=self.goal_region.pose.p - self.ball.pose.p,
            )
        return obs

    def compute_dense_reward(self, obs, action, info):
        unit_vec = self.ball.pose.p - self.goal_region.pose.p
        unit_vec = unit_vec / jnp.maximum(
            jnp.linalg.norm(unit_vec, axis=1, keepdims=True), 1e-9
        )
        hit_p = self.ball.pose.p + unit_vec * (self.ball_radius + 0.05)
        tcp_to_hit_dist = jnp.linalg.norm(hit_p - self.agent.tcp.pose.p, axis=1)
        reached = self.scene.get_extra("reached_status")
        reached = jnp.maximum(reached, (tcp_to_hit_dist < 0.04).astype(jnp.float32))
        self.scene.set_extra("reached_status", reached, masked=False)

        reaching_reward = 1 - jnp.tanh(2 * tcp_to_hit_dist)
        obj_to_goal = jnp.linalg.norm(
            self.ball.pose.p[..., :2] - self.goal_region.pose.p[..., :2], axis=1
        )
        reached_reward = 1 - jnp.tanh(obj_to_goal)
        reward = (
            20 * reached_reward * reached + reaching_reward * (1 - reached) + reached
        )
        return jnp.where(info["success"], 30.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 30.0
