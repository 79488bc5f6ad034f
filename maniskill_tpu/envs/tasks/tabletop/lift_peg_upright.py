"""LiftPegUpright-v1 (counterpart of
mani_skill/envs/tasks/tabletop/lift_peg_upright.py): reorient a lying peg to
stand upright on the table."""
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


@register_env("LiftPegUpright-v1", max_episode_steps=50)
class LiftPegUprightEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]
    peg_half_width = 0.025
    peg_half_length = 0.12

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
        self.peg = actors.build_twocolor_peg(
            self.scene, length=self.peg_half_length, width=self.peg_half_width,
            color_1=np.array([176, 14, 14, 255]) / 255,
            color_2=np.array([12, 42, 160, 255]) / 255,
            name="peg", body_type="dynamic",
            initial_pose=np.array([0, 0, 0.1, 1, 0, 0, 0]),
        )

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        xy = self._batched_episode_rng.uniform(-0.1, 0.1, (2,))
        xyz = jnp.concatenate(
            [xy, jnp.full((b, 1), self.peg_half_width, jnp.float32)], axis=-1
        )
        self.peg.set_pose(Pose.create_from_pq(p=xyz, q=euler2quat(np.pi / 2, 0, 0)))

    def evaluate(self):
        euler = rc.matrix_to_euler_angles(
            rc.quaternion_to_matrix(self.peg.pose.q), "XYZ"
        )
        is_peg_upright = jnp.abs(jnp.abs(euler[:, 2]) - np.pi / 2) < 0.08
        close_to_table = jnp.abs(self.peg.pose.p[:, 2] - self.peg_half_length) < 0.005
        return {"success": is_peg_upright & close_to_table}

    def _get_obs_extra(self, info: dict):
        obs = dict(tcp_pose=self.agent.tcp.pose.raw_pose)
        if self.obs_mode_struct["use_state"]:
            obs.update(obj_pose=self.peg.pose.raw_pose)
        return obs

    def compute_dense_reward(self, obs, action, info):
        qmats = rc.quaternion_to_matrix(self.peg.pose.q)
        rot_vec = qmats[..., :, 0]  # peg local +x in world
        rot_rew = jnp.abs(rot_vec[..., 2])
        reward = rot_rew

        z_dist = jnp.abs(self.peg.pose.p[:, 2] - self.peg_half_length)
        reward = reward + 1 - jnp.tanh(5 * z_dist)

        to_grip = self.peg.pose.p - self.agent.tcp.pose.p
        reaching = 1 - jnp.tanh(5 * jnp.linalg.norm(to_grip, axis=1))
        reaching = jnp.where(self.agent.is_grasping(self.peg), 1.0, reaching)
        reward = reward + reaching / 5
        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 3.0
