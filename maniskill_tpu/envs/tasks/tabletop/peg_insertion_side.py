"""PegInsertionSide-v1 (counterpart of
mani_skill/envs/tasks/tabletop/peg_insertion_side.py).

The reference randomizes peg/hole geometry at RECONFIGURATION by building
per-env sapien entities and merging views (Actor.merge). Here per-env
geometry is native: peg half-sizes and the hole block's plate sizes/offsets
are (B, ...) parameter tables sampled once at load — no rebuild, no merge,
no recompilation.

Success: the peg head crosses the hole's mid-plane within the hole radius.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....sensors.camera import CameraConfig
from ....structs.pose import Pose
from ....utils.geometry import rotation_conversions as rc
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ....scene_builder.table import TableSceneBuilder
from ...base_env import BaseEnv


@register_env("PegInsertionSide-v1", max_episode_steps=100)
class PegInsertionSideEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]
    _clearance = 0.003

    def __init__(self, *args, robot_uids="panda", **kwargs):
        # fixed geometry_seed pins the geometry distribution (tests); the
        # default samples fresh geometry from the episode RNG at every
        # reconfigure (reference peg_insertion_side.py:76-83)
        self._geom_seed = kwargs.pop("geometry_seed", None)
        if "reconfiguration_freq" not in kwargs or kwargs["reconfiguration_freq"] is None:
            # single-env runs reconfigure every reset (reference :69-74)
            kwargs["reconfiguration_freq"] = 1 if kwargs.get("num_envs", 1) == 1 else 0
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at([0, -0.3, 0.2], [0, 0, 0.1])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.5, -0.5, 0.8], [0.05, -0.1, 0.4])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.615, 0, 0, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.table_scene = TableSceneBuilder(self)
        self.table_scene.build()

        B = self.num_envs
        if self._geom_seed is not None:
            rng = np.random.RandomState(self._geom_seed)
            lengths = rng.uniform(0.085, 0.125, B).astype(np.float32)
            radii = rng.uniform(0.015, 0.025, B).astype(np.float32)
        else:
            # per-env geometry from the episode seeds: every reconfigure
            # draws a fresh distribution (reference reconfigures with fresh
            # episode RNG each reset, peg_insertion_side.py:76-83)
            rngs = [
                np.random.RandomState(int(s) & 0x7FFFFFFF)
                for s in self._episode_seeds
            ]
            lengths = np.array(
                [r.uniform(0.085, 0.125) for r in rngs], np.float32
            )
            radii = np.array([r.uniform(0.015, 0.025) for r in rngs], np.float32)
        self.peg_half_sizes = jnp.asarray(
            np.stack([lengths, radii, radii], axis=1)
        )
        self.box_hole_radii = jnp.asarray(radii + self._clearance)

        # peg actor: nominal size; per-env sizes applied after finalize
        b = self.scene.create_actor_builder()
        b.add_box_collision(half_size=(0.1, 0.02, 0.02), friction=1.0)
        b.add_box_visual(
            pose=np.array([0.05, 0, 0, 1, 0, 0, 0]),
            half_size=(0.05, 0.02, 0.02), color=(0.84, 0.42, 0.21, 1),
        )
        b.add_box_visual(
            pose=np.array([-0.05, 0, 0, 1, 0, 0, 0]),
            half_size=(0.05, 0.02, 0.02), color=(0.93, 0.96, 0.98, 1),
        )
        b.set_initial_pose(np.array([0, -0.15, 0.02, 1, 0, 0, 0]))
        self.peg = b.build("peg")

        # box with hole: 4 plates forming a square hole along +x
        bb = self.scene.create_actor_builder()
        t = 0.04  # nominal plate thickness (overwritten per env)
        d, r = 0.1, 0.023
        self._plate_poses_nominal = [
            np.array([0, r + t, 0]), np.array([0, -(r + t), 0]),
            np.array([0, 0, r + t]), np.array([0, 0, -(r + t)]),
        ]
        for pose in self._plate_poses_nominal:
            bb.add_box_collision(
                pose=np.concatenate([pose, [1, 0, 0, 0]]),
                half_size=(d, t, t + 2 * r), friction=1.0,
            )
            bb.add_box_visual(
                pose=np.concatenate([pose, [1, 0, 0, 0]]),
                half_size=(d, t, t + 2 * r), color=(1.0, 0.82, 0.54, 1),
            )
        bb.set_initial_pose(np.array([0, 0.25, 0.1, 1, 0, 0, 0]))
        self.box = bb.build_kinematic("box_with_hole")

    def _after_reconfigure(self, options: dict):
        """Apply the per-env heterogeneous geometry tables."""
        m = self.scene.model
        B = self.num_envs
        gs = m.geom_size
        if gs.ndim == 2:
            gs = jnp.broadcast_to(gs, (B,) + gs.shape)
        gp = m.geom_pos
        if gp.ndim == 2:
            gp = jnp.broadcast_to(gp, (B,) + gp.shape)

        # peg collision geom
        peg_gid = int(self.peg.geom_ids[0])
        gs = gs.at[:, peg_gid].set(self.peg_half_sizes)

        # hole plates: outer=length, thickness fixed, offset = radius+thickness
        hole_gids = [g for g in self.box.geom_ids
                     if self.scene.mb.geoms[g].collision][:4]
        L = self.peg_half_sizes[:, 0]
        r = self.box_hole_radii
        t = 0.04
        signs = [(0, 1), (0, -1), (1, 1), (1, -1)]  # (axis: 0=y 1=z, direction)
        for gid, (axis, sgn) in zip(hole_gids, signs):
            size = jnp.stack(
                [L, jnp.full((B,), t), jnp.full((B,), t) + 2 * r]
                if axis == 0
                else [L, jnp.full((B,), t) + 2 * r, jnp.full((B,), t)],
                axis=1,
            )
            gs = gs.at[:, gid].set(size)
            off = jnp.zeros((B, 3)).at[:, 1 + axis].set(sgn * (r + t))
            gp = gp.at[:, gid].set(off)
        self.scene.model = m.replace(geom_size=gs, geom_pos=gp)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        b = self.num_envs
        self.table_scene.initialize(env_idx)
        rng = self._batched_episode_rng
        xy = jnp.stack(
            [rng.uniform(-0.1, 0.1), rng.uniform(-0.3, 0.0)], axis=-1
        )
        pos = jnp.concatenate([xy, self.peg_half_sizes[:, 2:3]], axis=-1)
        ang = np.pi / 2 + rng.uniform(-np.pi / 3, np.pi / 3)
        zeros = jnp.zeros_like(ang)
        quat = rc.axis_angle_to_quaternion(jnp.stack([zeros, zeros, ang], axis=-1))
        self.peg.set_pose(Pose.create_from_pq(pos, quat))

        bxy = jnp.stack(
            [rng.uniform(-0.05, 0.05), rng.uniform(0.2, 0.4)], axis=-1
        )
        bpos = jnp.concatenate([bxy, self.peg_half_sizes[:, 0:1]], axis=-1)
        bang = np.pi / 2 + rng.uniform(-np.pi / 8, np.pi / 8)
        bquat = rc.axis_angle_to_quaternion(jnp.stack([zeros, zeros, bang], axis=-1))
        self.box.set_pose(Pose.create_from_pq(bpos, bquat))

    @property
    def peg_head_offsets(self) -> Pose:
        off = jnp.zeros((self.num_envs, 3)).at[:, 0].set(self.peg_half_sizes[:, 0])
        return Pose.create_from_pq(p=off)

    @property
    def peg_head_pose(self) -> Pose:
        return self.peg.pose * self.peg_head_offsets

    @property
    def box_hole_pose(self) -> Pose:
        return self.box.pose  # hole centered in the box frame

    @property
    def goal_pose(self) -> Pose:
        return self.box.pose * self.peg_head_offsets.inv()

    def has_peg_inserted(self):
        p = (self.box_hole_pose.inv() * self.peg_head_pose).p
        r = self.box_hole_radii
        x_flag = p[:, 0] >= -0.015
        y_flag = (p[:, 1] >= -r) & (p[:, 1] <= r)
        z_flag = (p[:, 2] >= -r) & (p[:, 2] <= r)
        return x_flag & y_flag & z_flag, p

    def evaluate(self):
        success, peg_head_pos_at_hole = self.has_peg_inserted()
        return dict(success=success, peg_head_pos_at_hole=peg_head_pos_at_hole)

    def _get_obs_extra(self, info: dict):
        obs = dict(tcp_pose=self.agent.tcp.pose.raw_pose)
        if self.obs_mode_struct["use_state"]:
            obs.update(
                peg_pose=self.peg.pose.raw_pose,
                peg_half_size=self.peg_half_sizes,
                box_hole_pose=self.box_hole_pose.raw_pose,
                box_hole_radius=self.box_hole_radii,
            )
        return obs

    def compute_dense_reward(self, obs, action, info):
        gripper_pos = self.agent.tcp.pose.p
        tgt = self.peg.pose * Pose.create(jnp.asarray([-0.06, 0, 0, 1, 0, 0, 0]))
        reaching = 1 - jnp.tanh(4.0 * jnp.linalg.norm(gripper_pos - tgt.p, axis=1))
        is_grasped = self.agent.is_grasping(self.peg, max_angle=20)
        reward = reaching + is_grasped

        head_wrt_goal = (self.goal_pose.inv() * self.peg_head_pose).p
        head_yz = jnp.linalg.norm(head_wrt_goal[:, 1:], axis=1)
        peg_wrt_goal = (self.goal_pose.inv() * self.peg.pose).p
        peg_yz = jnp.linalg.norm(peg_wrt_goal[:, 1:], axis=1)
        pre_insertion = 3 * (
            1 - jnp.tanh(0.5 * (head_yz + peg_yz) + 4.5 * jnp.maximum(head_yz, peg_yz))
        )
        reward = reward + pre_insertion * is_grasped
        pre_inserted = (head_yz < 0.01) & (peg_yz < 0.01)

        inside = (self.box_hole_pose.inv() * self.peg_head_pose).p
        insertion = 5 * (1 - jnp.tanh(5.0 * jnp.linalg.norm(inside, axis=1)))
        reward = reward + insertion * (is_grasped & pre_inserted)
        return jnp.where(info["success"], 10.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 10.0
