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
        """Per-env heterogeneous REAL cabinets: every env samples its own
        PartNet-Mobility model; the union-template articulation
        (building/articulations/partnet_union.py) realizes each model's
        hulls/joints through per-env parameter tables (reference
        open_cabinet_drawer.py:134-176 samples a model per sub-scene)."""
        from ....building.articulations.partnet_mobility import (
            available_model_ids,
        )
        from ....building.articulations.partnet_union import (
            build_partnet_union,
            load_partnet_model_spec,
        )

        ids = available_model_ids()
        specs = {m: load_partnet_model_spec(self.scene, m) for m in ids}
        # models usable for this task: at least one slot of the target kind
        ok = [
            m for m in ids
            if any(sl.kind == self.target_kind for sl in specs[m].slots)
        ]
        self._pn_ids = ok or ids
        self._pn_specs = {m: specs[m] for m in self._pn_specs_needed(specs)}
        self.cabinet, self.cab_meta, (kb, ks) = build_partnet_union(
            self.scene, [specs[m] for m in self._pn_ids], "cabinet"
        )
        self._pn_kb_ks = (kb, ks)
        self._pn_kinds = list(self.cab_meta.kinds)

    def _pn_specs_needed(self, specs):
        return list(specs)

    def _after_reconfigure_partnet(self, options: dict):
        from ....building.articulations.partnet_union import (
            UNION_SLOTS,
            apply_partnet_models,
        )

        B = self.num_envs
        rng = np.random.RandomState(
            int(np.asarray(self._episode_seeds[0])) & 0x7FFFFFFF
        )
        assign = [self._pn_ids[i] for i in rng.randint(0, len(self._pn_ids), B)]
        kb, ks = self._pn_kb_ks
        inst = apply_partnet_models(
            self.scene, self.cab_meta, self._pn_specs, assign, kb, ks
        )
        self._pn_assign = inst
        self._pn_model_ids = assign

        # per-env target slot among active slots of the right kind
        S = UNION_SLOTS
        targets = np.zeros(B, np.int64)
        for i in range(B):
            cands = [
                s for s in range(S)
                if inst.active[i, s] and self._pn_kinds[s] == self.target_kind
            ] or [s for s in range(S) if inst.active[i, s]]
            targets[i] = cands[rng.randint(len(cands))]
        self.target_slot = jnp.asarray(targets)
        self.target_onehot = jnp.asarray(np.eye(S, dtype=np.float32)[targets])
        self.handle_local = jnp.asarray(inst.handle_local)
        # ranges for open-fraction math; signed dof limits already scattered
        self.slot_limits = jnp.asarray(
            np.stack([np.zeros_like(inst.ranges), inst.ranges], axis=-1)
        )
        self.active_mask = jnp.asarray(inst.active.astype(np.float32))
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
