"""PickClutterYCB-v1 (counterpart of
mani_skill/envs/tasks/tabletop/pick_clutter_ycb.py:23-220).

Semantics preserved: each env holds a clutter of YCB objects; one visible
object per env is designated the target (goal_site marks a point on it).
Like the reference, this is a data-collection/exploration env: evaluate
returns all-false success/fail and the only reward mode is "none".

TPU-native: K heterogeneous hull actors with per-env model sampling
(scene.set_per_env_hulls) replace the reference's per-sub-scene builds +
Actor.merge; the target object index per env lives in the task extras.
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
from ...utils.randomization import UniformPlacementSampler

N_CLUTTER = 4
MAX_HULLS = 4


@register_env("PickClutterYCB-v1", max_episode_steps=100)
class PickClutterYCBEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda", "fetch"]
    SUPPORTED_REWARD_MODES = ("none",)

    def __init__(self, *args, robot_uids="panda", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        self.all_model_ids = np.array(ycb.all_model_ids())
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
        from ....building.cooking import HULL_MAX_VERTS

        self.scene_builder = TableSceneBuilder(
            self, robot_init_qpos_noise=self.robot_init_qpos_noise
        )
        self.scene_builder.build()

        rng = self._main_rng or np.random.RandomState(2022)
        self.objs = []
        self._pending = []
        cooked_cache = {}
        for k in range(N_CLUTTER):
            model_ids = rng.choice(self.all_model_ids, size=self.num_envs)
            for mid in np.unique(model_ids):
                if mid not in cooked_cache:
                    parts = ycb.cooked_hulls(mid, max_parts=MAX_HULLS)
                    while len(parts) < MAX_HULLS:
                        parts.append(parts[0])
                    cooked_cache[mid] = np.stack(parts[:MAX_HULLS])
            builder = self.scene.create_actor_builder()
            template = cooked_cache[model_ids[0]]
            for j in range(MAX_HULLS):
                builder.add_convex_collision_from_mesh(
                    template[j], color=[0.75, 0.6, 0.4, 1.0]
                )
            builder.set_initial_pose([0.6 + 0.2 * k, 0, 0.1, 1, 0, 0, 0])
            obj = builder.build(name=f"clutter_{k}")
            self.objs.append(obj)
            hulls = np.stack([cooked_cache[m] for m in model_ids])
            assert hulls.shape[2] == HULL_MAX_VERTS
            lo = hulls.reshape(self.num_envs, -1, 3).min(axis=1)
            self._pending.append((obj, hulls, -lo[:, 2]))

        self.goal_site = actors.build_sphere(
            self.scene,
            radius=0.01,
            color=[0, 1, 0, 1],
            name="goal_site",
            body_type="kinematic",
            add_collision=False,
            initial_pose=np.array([0, 0, 0.3, 1, 0, 0, 0]),
        )
        self._hidden_objects.append(self.goal_site)
        self.scene.register_extra("target_idx", (), jnp.int32)

    def _after_reconfigure(self, options: dict):
        self.object_zs = []
        for obj, hulls, zs in self._pending:
            self.scene.set_per_env_hulls(obj, hulls)
            self.object_zs.append(jnp.asarray(zs, jnp.float32))

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.scene_builder.initialize(env_idx)
        rng = self._batched_episode_rng
        sampler = UniformPlacementSampler(bounds=[[-0.15, -0.2], [0.1, 0.2]], batch_size=b)
        for k, obj in enumerate(self.objs):
            xy = sampler.sample(rng, 0.08)
            xyz = jnp.concatenate([xy, self.object_zs[k][:, None]], axis=-1)
            qs = rng.quaternions(lock_x=True, lock_y=True)
            obj.set_pose(Pose.create_from_pq(xyz, qs))
        tgt = rng.randint(0, N_CLUTTER)
        self.scene.set_extra("target_idx", tgt)
        # goal: a point above the target object
        obj_ps = jnp.stack([o.pose.p for o in self.objs], axis=1)  # (B, K, 3)
        tgt_p = jnp.take_along_axis(obj_ps, tgt[:, None, None].repeat(3, -1), axis=1)[
            :, 0
        ]
        goal = tgt_p + rng.uniform(0.0, 0.2, (3,)) * jnp.asarray([0.3, 0.3, 1.0]) + jnp.asarray([0, 0, 0.1])
        self.goal_site.set_pose(Pose.create_from_pq(goal))

    @property
    def target_pos(self):
        obj_ps = jnp.stack([o.pose.p for o in self.objs], axis=1)
        tgt = self.scene.data.extras["target_idx"]
        return jnp.take_along_axis(
            obj_ps, tgt[:, None, None].repeat(3, -1), axis=1
        )[:, 0]

    def evaluate(self):
        # parity: the reference returns all-false (data-collection env)
        z = jnp.zeros(self.num_envs, bool)
        return {"success": z, "fail": z}

    def _get_obs_extra(self, info: dict):
        return dict(
            tcp_pose=self.agent.tcp_pose.raw_pose,
            goal_pos=self.goal_site.pose.p,
            target_pos=self.target_pos,
        )
