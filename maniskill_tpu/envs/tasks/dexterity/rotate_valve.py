"""RotateValve (counterpart of
mani_skill/envs/tasks/dexterity/rotate_valve.py): a DClaw hand rotates a
tri-spoke valve by a difficulty-dependent angle.

Difficulty levels preserved: 0 = quarter turn (tri-valve), 1-3 = half turn,
4 = full turn; levels >= 2 in the reference randomize valve spoke counts —
here per-env HETEROGENEOUS spoke lengths stand in (per-env geom sizes) since
the spoke count must be static under jit.
"""
from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from ....agents.robots.dclaw.dclaw import DClaw
from ....building.articulation_builder import ArticulationBuilder, LinkSpec, ShapeSpec
from ....building.ground import build_ground
from ....physics.types import CAPSULE, CYLINDER, HINGE
from ....sensors.camera import CameraConfig
from ....structs.types import SceneConfig, SimConfig
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ...base_env import BaseEnv


def _build_valve(scene, n_spokes=3, spoke_len=0.08):
    b = ArticulationBuilder(scene)
    b.add_link(LinkSpec("valve_base", None))
    shapes = []
    for i in range(n_spokes):
        ang = 2 * np.pi * i / n_spokes
        quat = np.array([np.cos(ang / 2), 0, 0, np.sin(ang / 2)])
        # spoke along +x rotated by ang: capsule at half-length offset
        mid = (spoke_len / 2 * np.cos(ang), spoke_len / 2 * np.sin(ang), 0)
        rot_y = np.array([np.cos(np.pi / 4), 0, np.sin(np.pi / 4), 0])
        # capsule axis is +z; rotate to lie along the spoke direction
        from ....building.inertia import quat_to_mat_np

        shapes.append(
            ShapeSpec(
                CAPSULE, [0.015, spoke_len / 2, 0], mid,
                _quat_mul(quat, rot_y), friction=2.0, color=(0.7, 0.1, 0.1, 1),
            )
        )
    hub = ShapeSpec(CYLINDER, [0.02, 0.02, 0], (0, 0, 0), friction=2.0,
                    color=(0.4, 0.4, 0.4, 1))
    shapes.append(hub)
    b.add_link(
        LinkSpec(
            "valve", "valve_base", HINGE, "valve_joint", axis=(0, 0, 1),
            damping=0.2, armature=0.005,
            collisions=shapes, visuals=shapes,
        )
    )
    b.set_initial_pose(np.array([0, 0, 0.05, 1, 0, 0, 0]))
    return b.build("valve")


def _quat_mul(a, b):
    aw, ax, ay, az = a
    bw, bx, by, bz = b
    return np.array(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ]
    )


class RotateValveEnv(BaseEnv):
    SUPPORTED_ROBOTS = ["dclaw"]

    def __init__(
        self, *args, robot_uids="dclaw", robot_init_qpos_noise=0.02,
        valve_init_pos_noise=0.02, difficulty_level: int = 0, **kwargs,
    ):
        if not isinstance(difficulty_level, int) or not (0 <= difficulty_level < 5):
            raise ValueError(
                f"Difficulty level must be an int within 0-4, got {difficulty_level}"
            )
        self.robot_init_qpos_noise = robot_init_qpos_noise
        self.valve_init_pos_noise = valve_init_pos_noise
        self.difficulty_level = difficulty_level
        if difficulty_level == 0:
            self.success_threshold = np.pi / 2
        elif difficulty_level == 4:
            self.success_threshold = np.pi * 2
        else:
            self.success_threshold = np.pi
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sim_config(self):
        return SimConfig(
            sim_freq=120, control_freq=60,
            scene_config=SceneConfig(solver_position_iterations=16),
        )

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0.3, 0.3, 0.4], target=[0, 0, 0.1])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0.35, 0.35, 0.5], [0, 0, 0.1])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_agent(self, options: dict):
        super()._load_agent(options, np.array([0, 0, 0.30, 1, 0, 0, 0]))

    def _load_scene(self, options: dict):
        self.ground = build_ground(self.scene)
        self.valve = _build_valve(self.scene)
        self.valve_joint = self.valve.joints_map["valve_joint"]
        if self.difficulty_level >= 2:
            # heterogeneous valves: per-env spoke lengths (static count)
            rng = np.random.RandomState(0)
            scales = rng.uniform(0.8, 1.2, size=(self.num_envs, 1))
            # applied after finalize in _after_reconfigure
            self._spoke_scales = scales
        else:
            self._spoke_scales = None

    def _after_reconfigure(self, options: dict):
        if self._spoke_scales is not None:
            m = self.scene.model
            gs = m.geom_size
            if gs.ndim == 2:
                gs = jnp.broadcast_to(gs, (self.num_envs,) + gs.shape)
            spoke_gids = [
                g for g, name in enumerate(m.geom_names)
                if name.startswith("valve:valve_col") and int(m.geom_type[g]) == CAPSULE
            ]
            if spoke_gids:
                base = gs[:, spoke_gids]
                scaled = base.at[..., 1].mul(jnp.asarray(self._spoke_scales))
                self.scene.model = m.replace(geom_size=gs.at[:, spoke_gids].set(scaled))

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        rng = self._batched_episode_rng
        kf = self.agent.keyframes["rest"]
        qpos = jnp.asarray(kf.qpos, jnp.float32)
        noise = rng.normal(0.0, self.robot_init_qpos_noise, size=(len(kf.qpos),))
        self.agent.reset(qpos + noise)
        v0 = rng.uniform(-np.pi, np.pi)
        self.valve.set_qpos(v0[:, None])
        self.valve.set_qvel(jnp.zeros((self.num_envs, 1), jnp.float32))
        self.scene.set_extra("valve_start", v0, masked=True)

    def _load_lighting(self, options):
        super()._load_lighting(options)
        self.scene.register_extra("valve_start")

    @property
    def rotated_angle(self):
        return self.valve_joint.qpos[:, 0] - self.scene.get_extra("valve_start")

    def evaluate(self):
        return {
            "success": self.rotated_angle >= self.success_threshold,
            "rotated": self.rotated_angle,
        }

    def _get_obs_extra(self, info: dict):
        obs = dict(
            valve_qpos=self.valve_joint.qpos,
            valve_qvel=self.valve_joint.qvel,
            rotated=info["rotated"],
        )
        return obs

    def compute_dense_reward(self, obs, action, info):
        progress = jnp.clip(info["rotated"] / self.success_threshold, -1.0, 1.0)
        spin = jnp.clip(self.valve_joint.qvel[:, 0], -2.0, 2.0) / 2.0
        reward = progress * 2 + spin * 0.2
        return jnp.where(info["success"], 3.0, reward)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info) / 3.0


for _lvl in range(5):
    register_env(f"RotateValveLevel{_lvl}-v1", max_episode_steps=300)(
        type(
            f"RotateValveLevel{_lvl}Env",
            (RotateValveEnv,),
            {
                "__init__": (
                    lambda lvl: lambda self, *a, **kw: RotateValveEnv.__init__(
                        self, *a, difficulty_level=lvl,
                        **{k: v for k, v in kw.items() if k != "difficulty_level"},
                    )
                )(_lvl)
            },
        )
    )
