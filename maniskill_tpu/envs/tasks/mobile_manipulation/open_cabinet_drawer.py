"""OpenCabinetDrawer-v1 / OpenCabinetDoor-v1 (counterpart of
mani_skill/envs/tasks/mobile_manipulation/open_cabinet_drawer.py).

Heterogeneous articulated assets: every env samples a cabinet VARIANT with a
different drawer/door count (the reference samples PartNet-Mobility models
per sub-scene and merges them, open_cabinet_drawer.py:128-176). Here the
union-template articulation (building/articulations/cabinet.py) realizes the
per-env structure through parameter tables — locked slots have zero joint
range, so qpos/DoF structure genuinely differs per env under one static
shape. Default robot is the Fetch mobile manipulator (reference :54).
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....building.articulations.cabinet import (
    CABINET_VARIANTS,
    MAX_DRAWERS,
    NUM_SLOTS,
    apply_cabinet_variants,
    build_cabinet_template,
    sample_cabinet_variants,
)
from ....building.ground import build_ground
from ....sensors.camera import CameraConfig
from ....utils.geometry.rotation_conversions import quaternion_apply
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ...base_env import BaseEnv


class OpenCabinetBase(BaseEnv):
    SUPPORTED_ROBOTS = ["fetch", "panda"]
    min_open_frac = 0.75  # reference open_cabinet_drawer.py:60
    target_kind = "drawer"  # or "door"

    def __init__(self, *args, robot_uids="fetch", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[-0.6, 0.9, 1.1], target=[0.2, 0, 0.4])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([1.6, 1.4, 1.2], [0.1, 0.0, 0.4])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([1.5, 0, 0, 0, 0, 0, 1]))

    def _variant_ok(self, v):
        return (v["drawers"] if self.target_kind == "drawer" else v["doors"]) > 0

    def _load_scene(self, options: dict):
        import os

        from ....building.articulations.partnet_mobility import (
            partnet_mobility_available,
        )

        self.ground = build_ground(self.scene)
        # real-asset path: when the PartNet-Mobility dataset (or the
        # committed schema fixture) is present, cook a real cabinet URDF into
        # the articulation tables instead of the procedural union template
        # (reference open_cabinet_drawer.py:134-176 samples real models)
        self._use_partnet = (
            os.environ.get("MS_PARTNET_CABINETS", "auto") != "0"
            and partnet_mobility_available()
        )
        if self._use_partnet:
            self._load_partnet_cabinet(options)
        else:
            self.cabinet, self.cab_meta = build_cabinet_template(self.scene)

    def _load_partnet_cabinet(self, options: dict):
        """Cook a real PartNet-Mobility URDF: URDF -> multi-hull convex
        decomposition -> articulation tables. All envs share the model's
        topology (static shapes); per-env randomization happens in target
        selection and initial state."""
        from ....building.articulations.partnet_mobility import (
            available_model_ids,
            get_partnet_mobility_builder,
            load_partnet_mobility_dataset,
        )

        ids = available_model_ids()
        rng = self._main_rng or np.random.RandomState(2024)
        mid = ids[rng.randint(len(ids))]
        builder, meta = get_partnet_mobility_builder(self.scene, mid)
        # place the cabinet with its bottom on the ground, front face +x
        bbox = meta.get("bbox")
        scale = float(meta.get("scale", 1.0))
        z0 = -bbox["min"][2] * scale if bbox else 0.4
        builder.set_initial_pose(np.array([0.1, 0.0, z0, 1, 0, 0, 0]))
        builder.disable_self_collisions = True
        self.cabinet = builder.build("cabinet")
        self._pn_model_id = mid

        # slots = movable joints; handle point = front-face center of the
        # link's collision AABB (host-side, from the builder specs)
        slots, handle_local, limits, kinds = [], [], [], []
        spec_of = {s.name: s for s in builder.links}
        from ....physics.types import HINGE, SLIDE

        for j in self.cabinet.active_joints:
            if j.jnt_type not in (HINGE, SLIDE):
                continue
            link = j.child_link
            spec = spec_of[link.name.split(":")[-1]]
            lo = np.full(3, np.inf)
            hi = np.full(3, -np.inf)
            for c in spec.collisions:
                if c.hull is not None:
                    v = np.asarray(c.hull) + np.asarray(c.pos)
                else:
                    half = np.asarray(c.size, float)
                    v = np.asarray(c.pos) + np.stack([half, -half])
                lo = np.minimum(lo, v.min(axis=0))
                hi = np.maximum(hi, v.max(axis=0))
            handle_local.append(
                [hi[0], 0.5 * (lo[1] + hi[1]), 0.5 * (lo[2] + hi[2])]
            )
            slots.append((link, j))
            lim = spec.limit
            lim = (
                (0.0, 1.0)
                if lim is None or not np.isfinite(lim).all()
                else (float(lim[0]), float(lim[1]))
            )
            limits.append(lim)
            kinds.append("drawer" if j.jnt_type == SLIDE else "door")
        self._pn_slots = slots
        self._pn_handle_local = np.asarray(handle_local, np.float32)
        self._pn_limits = np.asarray(limits, np.float32)
        self._pn_kinds = kinds

        class _Meta:
            pass

        m = _Meta()
        m.slot_links = [l for l, _ in slots]
        m.slot_joints = [j for _, j in slots]
        _Meta.slot_bodies = property(
            lambda s: np.array([l.body_id for l in s.slot_links], np.int32)
        )
        _Meta.slot_dofs = property(
            lambda s: np.array([j.dof_adr for j in s.slot_joints], np.int32)
        )
        _Meta.slot_qadrs = property(
            lambda s: np.array([j.q_adr for j in s.slot_joints], np.int32)
        )
        self.cab_meta = m

    def _after_reconfigure_partnet(self, options: dict):
        B = self.num_envs
        S = len(self._pn_slots)
        rng = np.random.RandomState(
            int(np.asarray(self._episode_seeds[0])) & 0x7FFFFFFF
        )
        cands = [i for i, k in enumerate(self._pn_kinds) if k == self.target_kind]
        if not cands:  # model lacks the target joint kind: fall back to any
            cands = list(range(S))
        targets = np.asarray(cands)[rng.randint(0, len(cands), B)]
        self.target_slot = jnp.asarray(targets)
        self.target_onehot = jnp.asarray(np.eye(S, dtype=np.float32)[targets])
        self.handle_local = jnp.broadcast_to(
            jnp.asarray(self._pn_handle_local), (B, S, 3)
        )
        self.slot_limits = jnp.broadcast_to(
            jnp.asarray(self._pn_limits), (B, S, 2)
        )
        self.active_mask = jnp.ones((B, S), jnp.float32)
        self._num_slots = S

    def _after_reconfigure(self, options: dict):
        if getattr(self, "_use_partnet", False):
            self._after_reconfigure_partnet(options)
            return
        self._num_slots = NUM_SLOTS
        # per-env tables bind to the finalized Model (scene.model exists now)
        B = self.num_envs

        # geometry from per-env episode seeds: fresh structure every
        # reconfigure (reference reconfigures with fresh episode RNG)
        rng = np.random.RandomState(
            int(np.asarray(self._episode_seeds[0])) & 0x7FFFFFFF
        )
        # sample variants restricted to those with the target joint kind
        valid_ids = np.array(
            [i for i, v in enumerate(CABINET_VARIANTS) if self._variant_ok(v)]
        )
        variant_ids = valid_ids[rng.randint(0, len(valid_ids), B)]
        inst = sample_cabinet_variants(rng, B, variant_ids=variant_ids)
        apply_cabinet_variants(self.scene, self.cab_meta, inst)
        self.cab_inst = inst

        # per-env target slot among active slots of the right kind
        slot_range = (
            range(MAX_DRAWERS)
            if self.target_kind == "drawer"
            else range(MAX_DRAWERS, NUM_SLOTS)
        )
        targets = np.zeros(B, np.int64)
        for i in range(B):
            cands = [s for s in slot_range if inst.active[i, s]]
            targets[i] = cands[rng.randint(len(cands))]
        self.target_slot = jnp.asarray(targets)
        self.target_onehot = jnp.asarray(
            np.eye(NUM_SLOTS, dtype=np.float32)[targets]
        )
        self.handle_local = jnp.asarray(inst.handle_local)  # (B, S, 3)
        self.slot_limits = jnp.asarray(inst.limits)  # (B, S, 2)
        self.active_mask = jnp.asarray(inst.active.astype(np.float32))

    # -- per-env target handle world position -----------------------------
    @property
    def handle_pos(self) -> jax.Array:
        d = self.scene.data
        bids = self.cab_meta.slot_bodies
        p = d.xpos[:, bids]  # (B, S, 3)
        q = d.xquat[:, bids]  # (B, S, 4)
        world = p + quaternion_apply(q, self.handle_local)
        return jnp.einsum("bs,bsk->bk", self.target_onehot, world)

    def _slot_fracs(self) -> jax.Array:
        q = self.scene.data.qpos[:, self.cab_meta.slot_qadrs]  # (B, S)
        lo = self.slot_limits[..., 0]
        hi = self.slot_limits[..., 1]
        return jnp.where(hi - lo > 1e-6, (q - lo) / (hi - lo + 1e-9), 0.0)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        B = self.num_envs
        kf = self.agent.keyframes.get("rest")
        qpos = jnp.broadcast_to(
            jnp.asarray(kf.qpos, jnp.float32), (B, len(kf.qpos))
        )
        noise = self._batched_episode_rng.normal(
            0.0, self.robot_init_qpos_noise, size=(len(kf.qpos),)
        )
        qpos = qpos + noise
        if self.robot_uids == "fetch":
            # base 1.6-1.8 m from the cabinet face, yaw within ±9°
            # (reference randomizations, open_cabinet_drawer.py:41)
            dist = self._batched_episode_rng.uniform(1.6, 1.8)
            yaw = self._batched_episode_rng.uniform(-np.pi / 32, np.pi / 32)
            qpos = qpos.at[:, 0].set(0.1 + dist)
            qpos = qpos.at[:, 1].set(self._batched_episode_rng.uniform(-0.2, 0.2))
            qpos = qpos.at[:, 2].set(np.pi + yaw)
        self.agent.reset(qpos)
        self.cabinet.set_qpos(jnp.zeros((B, self.cabinet.dof), jnp.float32))
        self.cabinet.set_qvel(jnp.zeros((B, self.cabinet.dof), jnp.float32))

    def evaluate(self):
        fracs = self._slot_fracs()
        frac = jnp.einsum("bs,bs->b", self.target_onehot, fracs)
        qv = self.scene.data.qvel[:, self.cab_meta.slot_dofs]
        target_qvel = jnp.einsum("bs,bs->b", self.target_onehot, qv)
        open_enough = frac >= self.min_open_frac
        is_static = jnp.abs(target_qvel) <= 0.05
        return {
            "success": open_enough & is_static,
            "open_frac": frac,
        }

    def _get_obs_extra(self, info: dict):
        obs = dict(
            tcp_pose=self.agent.tcp.pose.raw_pose,
            handle_pos=self.handle_pos,
            open_frac=info["open_frac"],
        )
        if self.obs_mode_struct["use_state"]:
            obs.update(
                slot_qpos=self.scene.data.qpos[:, self.cab_meta.slot_qadrs],
                slot_active=self.active_mask,
                target_onehot=self.target_onehot,
            )
        return obs

    def compute_dense_reward(self, obs, action, info):
        tcp_to_handle = jnp.linalg.norm(
            self.handle_pos - self.agent.tcp.pose.p, axis=1
        )
        reaching = 1 - jnp.tanh(5.0 * tcp_to_handle)
        open_reward = 2 * jnp.clip(info["open_frac"] / self.min_open_frac, 0.0, 1.0)
        reward = reaching + open_reward
        return jnp.where(info["success"], 5.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 5.0


@register_env("OpenCabinetDrawer-v1", max_episode_steps=100)
class OpenCabinetDrawerEnv(OpenCabinetBase):
    """Open the per-env target drawer past min_open_frac of its range."""

    target_kind = "drawer"


@register_env("OpenCabinetDoor-v1", max_episode_steps=100)
class OpenCabinetDoorEnv(OpenCabinetBase):
    """Open the per-env target door (revolute) past min_open_frac."""

    target_kind = "door"
