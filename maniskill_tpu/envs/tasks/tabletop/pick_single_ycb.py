"""PickSingleYCB-v1 (counterpart of
mani_skill/envs/tasks/tabletop/pick_single_ycb.py:26-260).

Semantics preserved: each parallel env holds a different object sampled from
the YCB model list (heterogeneous geometry — the reference's per-sub-scene
builds unified with Actor.merge, pick_single_ycb.py:139-151); the object
spawns flat on the table with random z-rotation and must be moved to a
random 3D goal; success = object within goal_thresh of goal AND robot
static. Objects come from the real YCB assets when downloaded, else
procedural stand-ins (building/actors/ycb.py).

TPU-native design: one actor with K convex-hull slots whose per-env vertex
tables are written by ``scene.set_per_env_hulls`` — no per-env Python
objects, one static-shape XLA program.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....building import actors
from ....building.actors import ycb
from ....sensors.camera import CameraConfig
from ....structs.pose import Pose
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....scene_builder.table import TableSceneBuilder
from ...base_env import BaseEnv

MAX_HULLS = 8


@register_env("PickSingleYCB-v1", max_episode_steps=50)
class PickSingleYCBEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda", "panda_wristcam"]

    goal_thresh = 0.025

    def __init__(
        self,
        *args,
        robot_uids="panda_wristcam",
        robot_init_qpos_noise=0.02,
        num_envs=1,
        reconfiguration_freq=None,
        **kwargs,
    ):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        self.all_model_ids = np.array(ycb.all_model_ids())
        if reconfiguration_freq is None:
            # single-env follows the reference: resample the object each
            # episode; batched envs keep one compiled geometry table
            reconfiguration_freq = 1 if num_envs == 1 else 0
        super().__init__(
            *args,
            robot_uids=robot_uids,
            num_envs=num_envs,
            reconfiguration_freq=reconfiguration_freq,
            **kwargs,
        )

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
        from ....building.cooking import HULL_MAX_VERTS

        self.table_scene = TableSceneBuilder(
            self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.table_scene.build()

        rng = self._main_rng or np.random.RandomState(2022)
        model_ids = rng.choice(self.all_model_ids, size=self.num_envs, replace=True)
        self.model_ids = model_ids

        # cook each distinct model once
        cooked = {}
        for mid in np.unique(model_ids):
            parts = ycb.cooked_hulls(mid, max_parts=MAX_HULLS)
            while len(parts) < MAX_HULLS:  # pad by repeating part 0
                parts.append(parts[0])
            cooked[mid] = np.stack(parts[:MAX_HULLS])  # (K, V, 3)

        # one actor with K hull slots; env 0's model seeds the shared table
        builder = self.scene.create_actor_builder()
        template = cooked[model_ids[0]]
        for k in range(MAX_HULLS):
            builder.add_convex_collision_from_mesh(
                template[k], density=1000.0, color=[0.82, 0.62, 0.35, 1.0]
            )
        builder.set_initial_pose([0, 0, 0.1, 1, 0, 0, 0])
        self.obj = builder.build(name="ycb_object")

        hulls = np.stack([cooked[m] for m in model_ids])  # (B, K, V, 3)
        assert hulls.shape[2] == HULL_MAX_VERTS
        self._pending_hulls = hulls

        # per-env resting height + mass from the hull AABB volume
        lo = hulls.reshape(self.num_envs, -1, 3).min(axis=1)
        hi = hulls.reshape(self.num_envs, -1, 3).max(axis=1)
        self.object_zs = jnp.asarray(-lo[:, 2], jnp.float32)
        vol = np.prod(np.maximum(hi - lo, 1e-4), axis=1)
        dens = np.array(
            [ycb.MODEL_DENSITIES.get(m, 1000.0) for m in model_ids], np.float64
        )
        self._pending_mass = np.clip(0.4 * vol * dens, 0.02, 2.0)  # ~40% AABB fill

        self.goal_site = actors.build_sphere(
            self.scene,
            radius=self.goal_thresh,
            color=[0, 1, 0, 1],
            name="goal_site",
            body_type="kinematic",
            add_collision=False,
            initial_pose=np.array([0, 0, 0, 1, 0, 0, 0]),
        )
        self._hidden_objects.append(self.goal_site)

    def _after_reconfigure(self, options: dict):
        # per-env tables are written post-finalize (the reference's
        # _after_reconfigure object_zs pattern, pick_single_ycb.py:163-170)
        self.scene.set_per_env_hulls(self.obj, self._pending_hulls)
        self.scene.set_per_env_body_mass(self.obj, self._pending_mass)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        rng = self._batched_episode_rng
        xy = rng.uniform(-0.1, 0.1, (2,))
        xyz = jnp.concatenate([xy, self.object_zs[:, None]], axis=-1)
        qs = rng.quaternions(lock_x=True, lock_y=True)
        self.obj.set_pose(Pose.create_from_pq(xyz, qs))

        gxy = rng.uniform(-0.1, 0.1, (2,))
        gz = rng.uniform(0.0, 0.3) + xyz[:, 2]
        goal_xyz = jnp.concatenate([gxy, gz[:, None]], axis=-1)
        self.goal_site.set_pose(Pose.create_from_pq(goal_xyz))

        # arm starts higher above the table than other tabletop tasks
        # (pick_single_ycb.py:189-198)
        qpos = jnp.asarray(
            [0.0, 0, 0, -np.pi * 2 / 3, 0, np.pi * 2 / 3, np.pi / 4, 0.04, 0.04],
            jnp.float32,
        )
        noise = rng.normal(0.0, self.robot_init_qpos_noise, (7,))
        qpos = jnp.broadcast_to(qpos, (b, 9)).at[:, :7].add(noise)
        self.agent.reset(qpos)  # root already fixed at [-0.615, 0, 0]

    def _get_obs_extra(self, info: dict):
        obs = dict(
            is_grasped=info["is_grasped"],
            tcp_pose=self.agent.tcp_pose.raw_pose,
            goal_pos=self.goal_site.pose.p,
        )
        if "state" in self.obs_mode:
            obs.update(
                tcp_to_goal_pos=self.goal_site.pose.p - self.agent.tcp_pose.p,
                obj_pose=self.obj.pose.raw_pose,
                tcp_to_obj_pos=self.obj.pose.p - self.agent.tcp_pose.p,
                obj_to_goal_pos=self.goal_site.pose.p - self.obj.pose.p,
            )
        return obs

    def evaluate(self):
        obj_to_goal_pos = self.goal_site.pose.p - self.obj.pose.p
        is_obj_placed = jnp.linalg.norm(obj_to_goal_pos, axis=1) <= self.goal_thresh
        is_grasped = self.agent.is_grasping(self.obj)
        is_robot_static = self.agent.is_static(0.2)
        return {
            "success": is_obj_placed & is_robot_static,
            "is_obj_placed": is_obj_placed,
            "is_robot_static": is_robot_static,
            "is_grasped": is_grasped,
        }

    def compute_dense_reward(self, obs, action, info):
        tcp_to_obj_dist = jnp.linalg.norm(
            self.obj.pose.p - self.agent.tcp_pose.p, axis=1
        )
        reward = 1 - jnp.tanh(5 * tcp_to_obj_dist)

        is_grasped = info["is_grasped"].astype(jnp.float32)
        reward = reward + is_grasped

        obj_to_goal_dist = jnp.linalg.norm(
            self.goal_site.pose.p - self.obj.pose.p, axis=1
        )
        place_reward = 1 - jnp.tanh(5 * obj_to_goal_dist)
        reward = reward + place_reward * is_grasped

        static_reward = 1 - jnp.tanh(
            5 * jnp.linalg.norm(self.agent.robot.qvel[..., :-2], axis=1)
        )
        reward = reward + static_reward * info["is_obj_placed"].astype(jnp.float32)

        reward = jnp.where(info["success"], 6.0, reward)
        return reward

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs=obs, action=action, info=info) / 6
