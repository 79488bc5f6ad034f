"""Hopper control tasks (counterpart of
mani_skill/envs/tasks/control/hopper.py, dm_control planar hopper).

The planar hopper is defined procedurally from the dm_control hopper.xml
constants: a slide-x/slide-z/hinge-y planar root (as a chain of dummy bodies —
one joint per body in this engine) carrying torso/pelvis/thigh/calf/foot.
"""
from __future__ import annotations

from typing import Union

import numpy as np
import jax
import jax.numpy as jnp

from ....agents.base_agent import BaseAgent
from ....agents.controllers import (
    PassiveControllerConfig,
    PDJointPosControllerConfig,
)
from ....building.articulation_builder import ArticulationBuilder, LinkSpec, ShapeSpec
from ....building.ground import build_ground
from ....physics.types import CAPSULE, HINGE, SLIDE
from ....sensors.camera import CameraConfig
from ....structs.types import SceneConfig, SimConfig
from ....utils.registration import register_env
from ....utils.scene_utils import look_at
from ...base_env import BaseEnv
from ...utils import rewards

_STAND_HEIGHT = 0.6
_HOP_SPEED = 2.0


def _fromto_capsule(a, b, r, friction=1.0):
    """Capsule between two points in the body frame (MJCF fromto semantics)."""
    a, b = np.asarray(a, float), np.asarray(b, float)
    mid = (a + b) / 2
    d = b - a
    L = np.linalg.norm(d)
    if L < 1e-9:
        quat = np.array([1.0, 0, 0, 0])
    else:
        z = d / L
        v = np.cross([0, 0, 1.0], z)
        w = 1.0 + z[2]
        q = np.array([w, *v])
        n = np.linalg.norm(q)
        quat = q / n if n > 1e-9 else np.array([0.0, 1.0, 0, 0])
    return ShapeSpec(CAPSULE, [r, L / 2, 0], mid, quat, friction=friction)


class HopperRobot(BaseAgent):
    uid = "hopper"
    fix_root_link = True
    disable_self_collisions = True

    def build_description(self):
        b = ArticulationBuilder(self.scene)
        deg = np.deg2rad
        # planar root: x-slide -> z-slide -> y-hinge chain of dummy bodies
        b.add_link(LinkSpec("world_anchor", None))
        b.add_link(
            LinkSpec(
                "rootx", "world_anchor", SLIDE, "rootx", axis=(1, 0, 0),
                origin_pos=(0, 0, 1.0), mass=1e-4, inertia=np.full(3, 1e-8),
            )
        )
        b.add_link(
            LinkSpec(
                "rootz", "rootx", SLIDE, "rootz", axis=(0, 0, 1),
                mass=1e-4, inertia=np.full(3, 1e-8),
            )
        )
        b.add_link(
            LinkSpec(
                "torso", "rootz", HINGE, "rooty", axis=(0, 1, 0),
                collisions=[
                    _fromto_capsule((0, 0, -0.05), (0, 0, 0.2), 0.0653),
                    _fromto_capsule((0.08, 0, 0.13), (0.15, 0, 0.14), 0.03),
                ],
                visuals=[
                    _fromto_capsule((0, 0, -0.05), (0, 0, 0.2), 0.0653),
                    _fromto_capsule((0.08, 0, 0.13), (0.15, 0, 0.14), 0.03),
                ],
            )
        )
        b.add_link(
            LinkSpec(
                "pelvis", "torso", HINGE, "waist", origin_pos=(0, 0, -0.05),
                axis=(0, 1, 0), limit=(deg(-30), deg(30)), damping=0.05, armature=0.2,
                collisions=[_fromto_capsule((0, 0, 0), (0, 0, -0.15), 0.065)],
                visuals=[_fromto_capsule((0, 0, 0), (0, 0, -0.15), 0.065)],
            )
        )
        b.add_link(
            LinkSpec(
                "thigh", "pelvis", HINGE, "hip", origin_pos=(0, 0, -0.2),
                axis=(0, 1, 0), limit=(deg(-144), deg(10)), damping=0.05, armature=0.2,
                collisions=[_fromto_capsule((0, 0, 0), (0, 0, -0.33), 0.04)],
                visuals=[_fromto_capsule((0, 0, 0), (0, 0, -0.33), 0.04)],
            )
        )
        b.add_link(
            LinkSpec(
                "calf", "thigh", HINGE, "knee", origin_pos=(0, 0, -0.33),
                axis=(0, 1, 0), limit=(deg(5), deg(150)), damping=0.05, armature=0.2,
                collisions=[_fromto_capsule((0, 0, 0), (0, 0, -0.32), 0.03)],
                visuals=[_fromto_capsule((0, 0, 0), (0, 0, -0.32), 0.03)],
            )
        )
        b.add_link(
            LinkSpec(
                "foot_heel", "calf", HINGE, "ankle", origin_pos=(0, 0, -0.32),
                axis=(0, 1, 0), limit=(deg(-45), deg(45)), damping=0.05, armature=0.2,
                collisions=[_fromto_capsule((-0.08, 0, 0), (0.11, 0, 0), 0.04)],
                visuals=[_fromto_capsule((-0.08, 0, 0), (0.11, 0, 0), 0.04)],
            )
        )
        b.add_link(
            LinkSpec(
                "foot_toe", "foot_heel", joint_type=3, joint_name="fix_toe2heel",
                collisions=[_fromto_capsule((0.11, 0, 0), (0.17, 0, 0), 0.04)],
                visuals=[_fromto_capsule((0.11, 0, 0), (0.17, 0, 0), 0.04)],
            )
        )
        return b

    @property
    def _controller_configs(self):
        max_delta = 2
        body = PDJointPosControllerConfig(
            joint_names=["hip", "knee", "waist"],
            lower=-max_delta, upper=max_delta,
            damping=10, stiffness=100, use_delta=True,
        )
        ankle = PDJointPosControllerConfig(
            joint_names=["ankle"],
            lower=-max_delta / 2.5, upper=max_delta / 2.5,
            damping=10, stiffness=100, use_delta=True,
        )
        rest = PassiveControllerConfig(
            joint_names=["rootx", "rootz", "rooty"], damping=0, friction=0
        )
        return dict(pd_joint_delta_pos=dict(body=body, ankle=ankle, rest=rest, balance_passive_force=False))

    def get_proprioception(self):
        # drop the x-slider qpos for x-translation invariance (reference parity)
        return dict(qpos=self.robot.qpos[:, 1:], qvel=self.robot.qvel)


class HopperEnv(BaseEnv):
    agent: Union[HopperRobot]

    def __init__(self, *args, robot_uids=HopperRobot, **kwargs):
        super().__init__(*args, robot_uids=robot_uids, **kwargs)

    @property
    def _default_sim_config(self):
        return SimConfig(
            sim_freq=200, control_freq=40,
            scene_config=SceneConfig(solver_position_iterations=8),
        )

    @property
    def _default_sensor_configs(self):
        pose = look_at(eye=[0, -2.8, 0.8], target=[0, 0, 0.5])
        return [CameraConfig("base_camera", pose, 128, 128, np.pi / 2, 0.01, 100)]

    @property
    def _default_human_render_camera_configs(self):
        pose = look_at([0, -3, 1], [0, 0, 0.5])
        return CameraConfig("render_camera", pose, 512, 512, 1, 0.01, 100)

    def _load_scene(self, options: dict):
        self.ground = build_ground(self.scene, friction=1.0)
        model = self.scene  # masses resolved after finalize in _after_reconfigure

    def _after_reconfigure(self, options: dict):
        m = self.scene.model
        masses = np.asarray(
            m.host_body_mass if m.host_body_mass is not None else m.body_mass,
            np.float32,
        )
        link_ids = [l.body_id for l in self.agent.robot.links[3:]]  # skip dummies
        self._link_ids = np.array(link_ids)
        self._link_masses = jnp.asarray(masses[self._link_ids])
        self._robot_mass = float(masses[self._link_ids].sum())

    def _initialize_episode(self, env_idx: jax.Array, options: dict):
        rng = self._batched_episode_rng
        b = self.num_envs
        dof = self.agent.robot.dof
        m = self.scene.model
        lims = np.asarray(
            m.host_dof_limit if m.host_dof_limit is not None else m.dof_limit
        )[self.agent.robot._vadr]
        lo = np.clip(lims[:, 0], -np.pi, np.pi)
        hi = np.clip(lims[:, 1], -np.pi, np.pi)
        u = rng.uniform(0.0, 1.0, (dof,))
        qpos = jnp.asarray(lo) + u * jnp.asarray(hi - lo)
        qpos = qpos.at[:, 0].set(0.0).at[:, 1].set(0.0)
        qpos = qpos.at[:, 2].set(np.pi * (2 * rng.uniform(0.0, 1.0) - 1))
        self.agent.reset(qpos)

    @property
    def height(self):
        return (
            self.agent.robot.links_map["torso"].pose.p[:, -1]
            - self.agent.robot.links_map["foot_heel"].pose.p[:, -1]
        )

    @property
    def subtreelinvelx(self):
        vels = jnp.stack(
            [
                self.scene.data.cvel[:, b, 0]
                for b in self._link_ids
            ],
            axis=0,
        )  # (links, B)
        return jnp.sum(vels * self._link_masses[:, None], axis=0) / self._robot_mass

    def touch(self, link_name):
        force = self.agent.robot.links_map[link_name].get_net_contact_forces()
        return jnp.log1p(jnp.linalg.norm(force, axis=-1))

    def _get_obs_state_dict(self, info: dict):
        return dict(
            agent=self._get_obs_agent(),
            toe_touch=self.touch("foot_toe"),
            heel_touch=self.touch("foot_heel"),
        )

    def evaluate(self):
        return {}


@register_env("MS-HopperStand-v1", max_episode_steps=600)
class HopperStandEnv(HopperEnv):
    def compute_dense_reward(self, obs, action, info):
        return rewards.tolerance(self.height, lower=_STAND_HEIGHT, upper=2.0)

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info)


@register_env("MS-HopperHop-v1", max_episode_steps=600)
class HopperHopEnv(HopperEnv):
    def compute_dense_reward(self, obs, action, info):
        standing = rewards.tolerance(self.height, lower=_STAND_HEIGHT, upper=2.0)
        hopping = rewards.tolerance(
            self.subtreelinvelx,
            lower=_HOP_SPEED, upper=jnp.inf,
            margin=_HOP_SPEED / 2, value_at_margin=0.5, sigmoid="linear",
        )
        return standing * (5 * hopping + 1) / 6

    def compute_normalized_dense_reward(self, obs, action, info):
        return self.compute_dense_reward(obs, action, info)
