"""AnymalC-Spin-v1 (counterpart of
mani_skill/envs/tasks/quadruped/quadruped_spin.py:19-140).

Semantics preserved: spin in place as fast as possible; reward = root yaw
angular velocity with velocity/contact/posture penalties; fail (reward
-100) when the body touches the ground. No success condition.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....building.ground import build_ground
from ....sensors.camera import CameraConfig
from ....structs.types import SceneConfig, SimConfig
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ...base_env import BaseEnv


class QuadrupedSpinEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["anymal_c"]

    _UNDESIRED_CONTACT_LINK_NAMES = None

    def __init__(self, *args, robot_uids="anymal_c", **kwargs):
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sim_config(self):
        return SimConfig(
            scene_config=SceneConfig(
                solver_position_iterations=4, solver_velocity_iterations=0
            )
        )

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.5, 0, 0.1], target=[1.0, 0, 0.0])
        return [
            CameraConfig(
                "base_camera", pose, 128, 128, np.pi / 2, 0.01, 100,
                mount=self.agent.robot.links[0],
            )
        ]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([-2.0, 1.5, 3], [1.5, 0.0, 0.5])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([0, 0, 1, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.ground = build_ground(self.scene)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        keyframe = self.agent.keyframes["standing"]
        self.agent.robot.set_root_pose(keyframe.pose)
        self.agent.reset(keyframe.qpos)

    def evaluate(self):
        is_fallen = self.agent.is_fallen()
        return {"fail": is_fallen, "is_fallen": is_fallen}

    def _get_obs_extra(self, info: dict):
        return dict(
            root_linear_velocity=self.agent.robot.root_linear_velocity,
            root_angular_velocity=self.agent.robot.root_angular_velocity,
        )

    def _compute_undesired_contacts(self, threshold=1.0):
        forces = self.agent.robot.get_net_contact_forces(
            self._UNDESIRED_CONTACT_LINK_NAMES
        )
        return jnp.linalg.norm(forces, axis=-1).max(-1) > threshold

    def compute_dense_reward(self, obs, action, info):
        rotation_reward = self.agent.robot.root_angular_velocity[:, 2]
        lin_vel_z_l2 = jnp.square(self.agent.robot.root_linear_velocity[:, 2])
        ang_vel_xy_l2 = jnp.square(
            self.agent.robot.root_angular_velocity[:, :2]
        ).sum(axis=1)
        penalties = (
            lin_vel_z_l2 * -2
            + ang_vel_xy_l2 * -0.05
            + self._compute_undesired_contacts().astype(jnp.float32) * -1
            + jnp.linalg.norm(
                self.agent.robot.qpos - jnp.asarray(self.default_qpos, jnp.float32),
                axis=1,
            )
            * -0.05
        )
        reward = 2 * rotation_reward + penalties
        return jnp.where(info["fail"], -100.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs=obs, action=action, info=info) / 2.0


@register_env("AnymalC-Spin-v1", max_episode_steps=200)
class AnymalCSpinEnv(QuadrupedSpinEnv):
    _UNDESIRED_CONTACT_LINK_NAMES = ["LF_SHANK", "LH_SHANK", "RF_SHANK", "RH_SHANK"]

    def __init__(self, *args, robot_uids="anymal_c", **kwargs):
        from ....agents.robots.anymal.anymal_c import ANYmalC

        self.default_qpos = ANYmalC.keyframes["standing"].qpos
        super().__init__(*args, robot_uids=robot_uids, **kwargs)
