"""PlaceSphere-v1 (counterpart of
mani_skill/envs/tasks/tabletop/place_sphere.py): pick a sphere and balance it
on top of a small open bin."""
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


@register_env("PlaceSphere-v1", max_episode_steps=50)
class PlaceSphereEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]

    radius = 0.02
    inner_side_half_len = 0.02
    short_side_half_size = 0.0025
    block_half_size = [0.0025, 0.025, 0.025]
    edge_block_half_size = [0.0025, 0.025, 0.005]

    def __init__(self, *args, robot_uids="panda", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0, 0.2], target=[-0.1, 0, 0])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.6, -0.2, 0.2], [0.0, 0.0, 0.2])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _build_bin(self):
        builder = self.scene.create_actor_builder()
        bh, eh = self.block_half_size, self.edge_block_half_size
        dx = bh[1] - bh[0]
        dy = bh[1] - bh[0]
        dz = eh[2] + bh[0]
        poses = [
            np.array([0, 0, 0, 1, 0, 0, 0]),
            np.array([-dx, 0, dz, 1, 0, 0, 0]),
            np.array([dx, 0, dz, 1, 0, 0, 0]),
            np.array([0, -dy, dz, 1, 0, 0, 0]),
            np.array([0, dy, dz, 1, 0, 0, 0]),
        ]
        half_sizes = [
            [bh[1], bh[2], bh[0]],
            eh,
            eh,
            [eh[1], eh[0], eh[2]],
            [eh[1], eh[0], eh[2]],
        ]
        for pose, half_size in zip(poses, half_sizes):
            builder.add_box_collision(pose=pose, half_size=half_size)
            builder.add_box_visual(pose=pose, half_size=half_size, color=(0.6, 0.5, 0.3, 1))
        builder.set_initial_pose(np.array([0.05, 0, self.block_half_size[0], 1, 0, 0, 0]))
        return builder.build_kinematic(name="bin")

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.615, 0, 0, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(
            env=self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()
        self.obj = actors.build_sphere(
            self.scene, radius=self.radius,
            color=np.array([12, 42, 160, 255]) / 255, name="sphere",
            body_type="dynamic",
            initial_pose=np.array([-0.08, 0, self.radius, 1, 0, 0, 0]),
        )
        self.bin = self._build_bin()

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        rng = self._batched_episode_rng
        x = rng.uniform(0.0, 1.0) * 0.05 - 0.1
        y = rng.uniform(0.0, 1.0) * 0.2 - 0.1
        xyz = jnp.stack([x, y, jnp.full((b,), self.radius, jnp.float32)], axis=-1)
        self.obj.set_pose(Pose.create_from_pq(p=xyz, q=[1, 0, 0, 0]))

        bx = rng.uniform(0.0, 1.0) * 0.1
        by = rng.uniform(0.0, 1.0) * 0.2 - 0.1
        bpos = jnp.stack(
            [bx, by, jnp.full((b,), self.block_half_size[0], jnp.float32)], axis=-1
        )
        self.bin.set_pose(Pose.create_from_pq(p=bpos, q=[1, 0, 0, 0]))

    def evaluate(self):
        pos_obj = self.obj.pose.p
        pos_bin = self.bin.pose.p
        offset = pos_obj - pos_bin
        xy_flag = jnp.linalg.norm(offset[..., :2], axis=1) <= 0.005
        z_flag = jnp.abs(offset[..., 2] - self.radius - self.block_half_size[0]) <= 0.005
        is_obj_on_bin = xy_flag & z_flag
        is_obj_static = self.obj.is_static_check(lin_thresh=1e-2, ang_thresh=0.5)
        is_obj_grasped = self.agent.is_grasping(self.obj)
        success = is_obj_on_bin & is_obj_static & (~is_obj_grasped)
        return {
            "is_obj_grasped": is_obj_grasped,
            "is_obj_on_bin": is_obj_on_bin,
            "is_obj_static": is_obj_static,
            "success": success,
        }

    def _get_obs_extra(self, info: dict):
        obs = dict(
            is_grasped=info["is_obj_grasped"],
            tcp_pose=self.agent.tcp.pose.raw_pose,
            bin_pos=self.bin.pose.p,
        )
        if "state" in self.obs_mode:
            obs.update(
                obj_pose=self.obj.pose.raw_pose,
                tcp_to_obj_pos=self.obj.pose.p - self.agent.tcp.pose.p,
            )
        return obs

    def compute_dense_reward(self, obs, action, info):
        tcp_pose = self.agent.tcp.pose.p
        obj_pos = self.obj.pose.p
        reward = 2 * (1 - jnp.tanh(5 * jnp.linalg.norm(tcp_pose - obj_pos, axis=1)))

        bin_top = self.bin.pose.p.at[:, 2].add(self.block_half_size[0] + self.radius)
        place_reward = 1 - jnp.tanh(5.0 * jnp.linalg.norm(bin_top - obj_pos, axis=1))
        grasped = info["is_obj_grasped"]
        reward = jnp.where(grasped, 4 + place_reward, reward)

        gripper_width = 0.08
        ungrasp = jnp.sum(self.agent.robot.qpos[:, -2:], axis=1) / gripper_width
        ungrasp = jnp.where(~grasped, 16.0, ungrasp)
        v = jnp.linalg.norm(self.obj.linear_velocity, axis=1)
        av = jnp.linalg.norm(self.obj.angular_velocity, axis=1)
        static_reward = 1 - jnp.tanh(v * 10 + av)
        robot_static = self.agent.is_static(0.2).astype(jnp.float32)
        reward = jnp.where(
            info["is_obj_on_bin"], 6 + (ungrasp + static_reward + robot_static) / 3.0,
            reward,
        )
        return jnp.where(info["success"], 13.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 13.0
