"""OpenCabinetDoor-v1 (counterpart of
mani_skill/envs/tasks/mobile_manipulation/open_cabinet_drawer.py's
OpenCabinetDoor variant).

Procedural cabinet (box shell + revolute door with a handle) like the
OpenCabinetDrawer build; task semantics preserved: swing the target door
past 90% of its joint range and keep it static.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....building.articulation_builder import ArticulationBuilder, LinkSpec, ShapeSpec
from ....building.ground import build_ground
from ....physics.types import BOX, HINGE
from ....sensors.camera import CameraConfig
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ...base_env import BaseEnv

CABINET_HALF = np.array([0.18, 0.25, 0.25])
WALL = 0.015
DOOR_RANGE = np.pi / 2


def _build_cabinet_door(scene, name="cabinet", base_pos=(0.0, 0.0, CABINET_HALF[2])):
    b = ArticulationBuilder(scene)
    hx, hy, hz = CABINET_HALF
    box = lambda hs, pos, color=(0.54, 0.39, 0.27, 1): ShapeSpec(
        BOX, hs, pos, friction=1.0, color=color
    )
    shell = [
        box((hx, hy, WALL), (0, 0, hz - WALL)),      # top
        box((hx, hy, WALL), (0, 0, -hz + WALL)),     # bottom
        box((hx, WALL, hz), (0, -hy + WALL, 0)),     # left
        box((hx, WALL, hz), (0, hy - WALL, 0)),      # right
        box((WALL, hy, hz), (-hx + WALL, 0, 0)),     # back
    ]
    b.add_link(LinkSpec("cabinet_base", None, collisions=shell, visuals=shell))
    # door: a panel hinged at the left front edge, swinging open about z;
    # handle bar near the free edge
    dy = hy - 2 * WALL
    panel = [
        box((WALL, dy, hz - 2 * WALL), (0, dy, 0), (0.72, 0.58, 0.4, 1)),
        box((0.03, 0.012, 0.06), (0.045, 2 * dy - 0.05, 0), (0.2, 0.2, 0.2, 1)),
    ]
    b.add_link(
        LinkSpec(
            "door", "cabinet_base", HINGE, "door_joint",
            origin_pos=(hx - WALL, -hy + WALL, 0), axis=(0, 0, 1),
            limit=(0.0, DOOR_RANGE), damping=2.0, frictionloss=0.5,
            collisions=panel, visuals=panel,
        )
    )
    b.set_initial_pose(np.array([*base_pos, 1, 0, 0, 0]))
    return b.build(name)


@register_env("OpenCabinetDoor-v1", max_episode_steps=100)
class OpenCabinetDoorEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["panda"]
    min_open_frac = 0.9

    def __init__(self, *args, robot_uids="panda", robot_init_qpos_noise=0.02, **kwargs):
        self.robot_init_qpos_noise = robot_init_qpos_noise
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[-0.6, 0.6, 0.8], target=[0.1, 0, 0.2])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([-0.8, 1.0, 1.0], [0.1, 0.0, 0.2])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([-0.75, 0, 0, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.ground = build_ground(self.scene)
        self.cabinet = _build_cabinet_door(
            self.scene, base_pos=(0.25, 0.0, CABINET_HALF[2])
        )
        self.door_joint = self.cabinet.joints_map["door_joint"]
        self.door_link = self.cabinet.links_map["door"]
        dy = CABINET_HALF[1] - 2 * WALL
        self.handle_offset = jnp.asarray([0.075, 2 * dy - 0.05, 0.0])

    @property
    def handle_pos(self):
        from ....utils.geometry.rotation_conversions import quaternion_apply

        p = self.door_link.pose
        return p.p + quaternion_apply(p.q, self.handle_offset)

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        kf = self.agent.keyframes.get("rest")
        qpos = jnp.asarray(kf.qpos, jnp.float32)
        noise = self._batched_episode_rng.normal(
            0.0, self.robot_init_qpos_noise, size=(len(kf.qpos),)
        )
        self.agent.reset(qpos + noise)
        q0 = self._batched_episode_rng.uniform(0.0, 0.05)
        self.cabinet.set_qpos(q0[:, None])
        self.cabinet.set_qvel(jnp.zeros((self.num_envs, 1), jnp.float32))

    def evaluate(self):
        frac = self.door_joint.qpos[:, 0] / DOOR_RANGE
        open_enough = frac >= self.min_open_frac
        is_static = jnp.abs(self.door_joint.qvel[:, 0]) <= 0.1
        return {"success": open_enough & is_static, "open_frac": frac}

    def _get_obs_extra(self, info: dict):
        obs = dict(
            tcp_pose=self.agent.tcp.pose.raw_pose,
            handle_pos=self.handle_pos,
            open_frac=info["open_frac"],
        )
        if self.obs_mode_struct["use_state"]:
            obs.update(door_qpos=self.door_joint.qpos)
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
