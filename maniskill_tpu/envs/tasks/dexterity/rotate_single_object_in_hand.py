"""RotateSingleObjectInHand (counterpart of
mani_skill/envs/tasks/dexterity/rotate_single_object_in_hand.py:24-330):
an Allegro hand held palm-up must spin an object about a given axis to a
cumulative 4*pi rotation.

Difficulty levels: 0 = fixed-size cube, z axis; 1 = per-env random cube
size, z axis; 2 = per-env random cube size, random axis. (The reference's
levels 2-3 use random YCB meshes — here heterogeneous cube sizing via the
native per-env geometry tables stands in; mesh variants need the asset
pipeline.)

Sticky episode state (rotation axis, tangent tracking vector, cumulative
angle) lives in Data.extras so it is jit-carried and partial-reset-masked.
"""
from __future__ import annotations

from typing import Any, Union

import numpy as np
import jax
import jax.numpy as jnp

from ....agents.robots.allegro_hand.allegro import AllegroHandRight, AllegroHandRightTouch
from ....building import actors
from ....sensors.camera import CameraConfig
from ....structs.pose import Pose
from ....structs.types import SceneConfig, SimConfig
from ....utils.geometry import rotation_conversions as rc
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....building.ground import build_ground
from ...base_env import BaseEnv

_HAND_INIT_HEIGHT = 0.25
_SUCCESS_ANGLE = 4 * np.pi


class RotateSingleObjectInHand(BaseEnv):
    SUPPORTED_ROBOTS = ["allegro_hand_right_touch"]
    agent: Union[AllegroHandRightTouch]
    difficulty_level: int = 0

    def __init__(self, *args, robot_uids="allegro_hand_right_touch", **kwargs):
        self.base_half_size = 0.035
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sim_config(self):
        return SimConfig(
            sim_freq=120, control_freq=60,
            scene_config=SceneConfig(solver_position_iterations=16),
        )

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0.3, 0.5], target=[0, 0, 0.25])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.25, 0.25, 0.4], [0, 0, 0.25])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        # palm up at fixed height (reference keyframe palm_up)
        super()._load_agent(
            options, np.array([0, 0, _HAND_INIT_HEIGHT, -0.7071068, 0, 0.7071068, 0])
        )

    def _load_scene(self, options: dict):
        self.ground = build_ground(self.scene)
        self.obj = actors.build_cube(
            self.scene, half_size=self.base_half_size, color=[1, 0.3, 0, 1],
            name="obj",
            initial_pose=np.array([0, 0, _HAND_INIT_HEIGHT + 0.06, 1, 0, 0, 0]),
        )
        self.scene.register_extra("rot_dir", (3,))
        self.scene.register_extra("prev_unit_vector", (3,))
        self.scene.register_extra("cum_rotation_angle", ())

    def _after_reconfigure(self, options: dict):
        if self.difficulty_level >= 1:
            rng = np.random.RandomState(2024)
            sizes = rng.uniform(0.03, 0.042, (self.num_envs,)).astype(np.float32)
            hs = np.stack([sizes] * 3, axis=-1)
            self.scene.set_per_env_geom_sizes(self.obj, hs)
            self._obj_heights = jnp.asarray(sizes)
        else:
            self._obj_heights = jnp.full(
                (self.num_envs,), self.base_half_size, jnp.float32
            )

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        rng = self._batched_episode_rng
        xy = 0.02 * (2 * rng.uniform(0.0, 1.0, (2,)) - 1)
        z = _HAND_INIT_HEIGHT + self._obj_heights + 0.03
        pos = jnp.concatenate([xy, z[:, None]], axis=-1)
        self.obj.set_pose(Pose.create_from_pq(pos))
        self.agent.reset(
            jnp.zeros((b, 16), jnp.float32)
            + 0.2 * rng.uniform(0.0, 1.0, (16,))
        )

        if self.difficulty_level >= 2:
            axis = (rng.uniform(0.0, 1.0) * 3).astype(jnp.int32) % 3
        else:
            axis = jnp.full((b,), 2, jnp.int32)
        rot_dir = jax.nn.one_hot(axis, 3)
        tangent = jax.nn.one_hot((axis + 1) % 3, 3)
        self.scene.set_extra("rot_dir", rot_dir)
        self.scene.set_extra("prev_unit_vector", tangent)
        self.scene.set_extra("cum_rotation_angle", jnp.zeros((b,)))

    def evaluate(self):
        obj_pose = self.obj.pose
        rot_dir = self.scene.get_extra("rot_dir")
        prev = self.scene.get_extra("prev_unit_vector")
        # track the rotation of a body-fixed tangent vector projected onto
        # the rotation plane (rotate_single_object_in_hand.py:242-262)
        tangent0 = jnp.roll(rot_dir, 1, axis=-1)  # unit vector orthogonal to axis
        v = rc.quaternion_apply(obj_pose.q, tangent0)
        v = v - jnp.sum(v * rot_dir, axis=-1, keepdims=True) * rot_dir
        v = v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + 1e-8)
        angle = jnp.arccos(jnp.clip(jnp.sum(v * prev, axis=-1), 0.0, 1.0))
        angle = jnp.clip(angle, -np.pi / 20, np.pi / 20)
        self.scene.set_extra("prev_unit_vector", v, masked=False)
        cum = self.scene.get_extra("cum_rotation_angle") + angle
        self.scene.set_extra("cum_rotation_angle", cum, masked=False)

        obj_vel = jnp.linalg.norm(self.obj.linear_velocity, axis=-1)
        obj_fall = obj_pose.p[:, 2] < (_HAND_INIT_HEIGHT - 0.05)
        tip_p = self.agent.tip_poses[..., :3]  # (B, 4, 3)
        obj_tip_vec = tip_p - obj_pose.p[:, None, :]
        obj_tip_dist = jnp.linalg.norm(obj_tip_vec, axis=-1)
        return dict(
            rotation_angle=angle,
            obj_vel=obj_vel,
            obj_fall=obj_fall,
            obj_tip_dist=obj_tip_dist,
            success=cum > _SUCCESS_ANGLE,
            fail=obj_fall,
        )

    def _get_obs_extra(self, info: dict):
        obs = dict(rotate_dir=self.scene.get_extra("rot_dir"))
        if self.obs_mode_struct["use_state"]:
            obs.update(
                obj_pose=self.obj.pose.raw_pose,
                palm_pose=self.agent.palm_pose,
                tip_poses=self.agent.tip_poses.reshape(self.num_envs, -1),
                cum_rotation=self.scene.get_extra("cum_rotation_angle")[:, None],
            )
        return obs

    def compute_dense_reward(self, obs: Any, action, info: dict):
        reward = 20.0 * info["rotation_angle"]
        reward = reward - 0.1 * info["obj_vel"]
        reward = reward - 50.0 * info["obj_fall"].astype(jnp.float32)
        dist_rew = jnp.clip(0.1 / (0.02 + 4 * info["obj_tip_dist"]), 0, 1)
        reward = reward + jnp.mean(dist_rew, axis=-1)
        return reward

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 4.0


@register_env("RotateSingleObjectInHandLevel0-v1", max_episode_steps=300)
class RotateSingleObjectInHandLevel0(RotateSingleObjectInHand):
    difficulty_level = 0


@register_env("RotateSingleObjectInHandLevel1-v1", max_episode_steps=300)
class RotateSingleObjectInHandLevel1(RotateSingleObjectInHand):
    difficulty_level = 1


@register_env("RotateSingleObjectInHandLevel2-v1", max_episode_steps=300)
class RotateSingleObjectInHandLevel2(RotateSingleObjectInHand):
    difficulty_level = 2


@register_env("RotateSingleObjectInHandLevel3-v1", max_episode_steps=300)
class RotateSingleObjectInHandLevel3(RotateSingleObjectInHand):
    """Level 3 (rotate_single_object_in_hand.py:374): per-env random YCB
    objects (cooked convex hulls in the per-env hull tables) + random axis."""

    difficulty_level = 3
    _YCB_MAX_HULLS = 4  # in-hand objects are small; 4 parts suffice

    def _load_scene(self, options: dict):
        from ....building.cooking import HULL_MAX_VERTS
        from ....building.actors import ycb

        self.ground = build_ground(self.scene)

        rng = self._main_rng or np.random.RandomState(2024)
        all_ids = np.array(ycb.all_model_ids())
        model_ids = rng.choice(all_ids, size=self.num_envs, replace=True)
        self.model_ids = model_ids

        cooked = {}
        for mid in np.unique(model_ids):
            parts = ycb.cooked_hulls(mid, max_parts=self._YCB_MAX_HULLS)
            while len(parts) < self._YCB_MAX_HULLS:
                parts.append(parts[0])
            cooked[mid] = np.stack(parts[: self._YCB_MAX_HULLS])

        # normalize each model to palm scale (reference scales YCB objects to
        # fit the Allegro palm): longest AABB edge -> ~7 cm
        hulls = np.stack([cooked[m] for m in model_ids])  # (B, K, V, 3)
        lo = hulls.reshape(self.num_envs, -1, 3).min(axis=1)
        hi = hulls.reshape(self.num_envs, -1, 3).max(axis=1)
        longest = np.maximum((hi - lo).max(axis=1), 1e-4)
        scale = (0.07 / longest)[:, None, None, None].astype(np.float32)
        center = (0.5 * (lo + hi))[:, None, None, :].astype(np.float32)
        hulls = (hulls - center) * scale
        assert hulls.shape[2] == HULL_MAX_VERTS

        builder = self.scene.create_actor_builder()
        for k in range(self._YCB_MAX_HULLS):
            builder.add_convex_collision_from_mesh(
                hulls[0, k], density=1000.0, color=[1, 0.3, 0, 1]
            )
        builder.set_initial_pose(
            np.array([0, 0, _HAND_INIT_HEIGHT + 0.06, 1, 0, 0, 0])
        )
        self.obj = builder.build(name="obj")
        self._pending_hulls = hulls

        self.scene.register_extra("rot_dir", (3,))
        self.scene.register_extra("prev_unit_vector", (3,))
        self.scene.register_extra("cum_rotation_angle", ())

    def _after_reconfigure(self, options: dict):
        self.scene.set_per_env_hulls(self.obj, self._pending_hulls)
        # half the scaled AABB height ~ resting clearance above the palm
        hh = self._pending_hulls.reshape(self.num_envs, -1, 3)[:, :, 2]
        self._obj_heights = jnp.asarray(hh.max(axis=1), jnp.float32)
