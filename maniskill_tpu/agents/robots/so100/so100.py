"""SO100 (LeRobot SO-ARM100) agent.

Counterpart of mani_skill/agents/robots/so100/so_100.py. Kinematic/inertial
constants from the public SO-ARM100 description (so100.urdf); collision
shapes are primitive approximations.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ...base_agent import BaseAgent, Keyframe
from ...registration import register_agent
from ...controllers import PDJointPosControllerConfig
from ....building.articulation_builder import ArticulationBuilder, LinkSpec, ShapeSpec
from ....physics.types import BOX, CAPSULE, FIXED, HINGE
from ....utils import common
from ....utils.geometry.rotation_conversions import quaternion_apply


def _rpy(r, p, y):
    cr, sr = np.cos(r / 2), np.sin(r / 2)
    cp, sp = np.cos(p / 2), np.sin(p / 2)
    cy, sy = np.cos(y / 2), np.sin(y / 2)
    return np.array(
        [
            cy * cp * cr + sy * sp * sr,
            cy * cp * sr - sy * sp * cr,
            cy * sp * cr + sy * cp * sr,
            sy * cp * cr - cy * sp * sr,
        ]
    )


def _I(ixx, iyy, izz, ixy, ixz, iyz):
    return np.array([[ixx, ixy, ixz], [ixy, iyy, iyz], [ixz, iyz, izz]])


JOINT_NAMES = [
    "shoulder_pan", "shoulder_lift", "elbow_flex", "wrist_flex", "wrist_roll",
    "gripper",
]


def so100_arm_links(prefix="", parent=None, origin_pos=(0, 0, 0),
                    origin_quat=(1, 0, 0, 0), joint_names=None):
    """The SO-ARM100 chain as LinkSpecs, optionally renamed/re-rooted so a
    multi-arm robot (xlerobot) can instantiate it twice."""
    import dataclasses as _dc

    cap = lambda r, hl, pos=(0, 0, 0), quat=(1, 0, 0, 0): ShapeSpec(
        CAPSULE, [r, hl, 0], pos, quat, friction=1.0
    )
    box = lambda hs, pos=(0, 0, 0), quat=(1, 0, 0, 0), fric=2.0: ShapeSpec(
        BOX, hs, pos, quat, friction=fric
    )
    links = [
        LinkSpec(
            "Base", None, mass=0.1932,
            com=(-2.46e-07, 0.03114, 0.01757),
                inertia=_I(1.3703e-4, 1.6909e-4, 1.451e-4, 2.1e-08, 4.2e-09, 2.265e-05),
                collisions=[box((0.04, 0.05, 0.025), (0, 0.03, 0.02))],
                visuals=[box((0.04, 0.05, 0.025), (0, 0.03, 0.02))],
            ),
            LinkSpec(
                "Rotation_Pitch", "Base", HINGE, "shoulder_pan",
                origin_pos=(0, -0.0452, 0.0165), origin_quat=_rpy(1.5708, 0, 0),
                axis=(0, -1, 0), limit=(-2.0, 2.0), armature=0.02,
                mass=0.1192, com=(-9.08e-05, 0.0591, 0.03109),
                inertia=_I(5.904e-05, 3.215e-05, 5.861e-05, 4.9e-07, -5.9e-08, -4.58e-06),
                collisions=[cap(0.03, 0.03, (0, 0.06, 0.03))],
                visuals=[cap(0.03, 0.03, (0, 0.06, 0.03))],
            ),
            LinkSpec(
                "Upper_Arm", "Rotation_Pitch", HINGE, "shoulder_lift",
                origin_pos=(0, 0.1025, 0.0306), axis=(1, 0, 0),
                limit=(-1.5708, 1.5708), armature=0.02,
                mass=0.1624, com=(-1.72e-05, 0.0702, 0.0031),
                inertia=_I(1.6715e-4, 7.019e-05, 2.1328e-4, 1.04e-06, -1.2e-08, 2.12e-06),
                collisions=[cap(0.025, 0.05, (0, 0.06, 0.01))],
                visuals=[cap(0.025, 0.05, (0, 0.06, 0.01))],
            ),
            LinkSpec(
                "Lower_Arm", "Upper_Arm", HINGE, "elbow_flex",
                origin_pos=(0, 0.11257, 0.028), axis=(1, 0, 0),
                limit=(-1.5708, 1.5708), armature=0.02,
                mass=0.148, com=(-0.0034, 0.0014, 0.0768),
                inertia=_I(1.0533e-4, 1.3877e-4, 5.087e-05, 1.7e-07, -1.17e-05, 1.77e-06),
                collisions=[cap(0.022, 0.05, (0, 0, 0.07))],
                visuals=[cap(0.022, 0.05, (0, 0, 0.07))],
            ),
            LinkSpec(
                "Wrist_Pitch_Roll", "Lower_Arm", HINGE, "wrist_flex",
                origin_pos=(0, 0.0052, 0.1349), origin_quat=_rpy(-1.5708, 0, 0),
                axis=(1, 0, 0), limit=(-1.8, 1.8), armature=0.01,
                mass=0.0661, com=(-0.0085, -0.0352, -2.3e-05),
                inertia=_I(1.957e-05, 2.38e-05, 3.454e-05, -6.6e-07, 5.2e-09, 4.1e-08),
                collisions=[cap(0.02, 0.02, (0, -0.03, 0))],
                visuals=[cap(0.02, 0.02, (0, -0.03, 0))],
            ),
            LinkSpec(
                "Fixed_Jaw", "Wrist_Pitch_Roll", HINGE, "wrist_roll",
                origin_pos=(0, -0.0601, 0), origin_quat=_rpy(0, 1.5708, 0),
                axis=(0, 1, 0), limit=(-3.14159, 3.14159), armature=0.01,
                mass=0.093, com=(0.0055, -0.028, 0.00048),
                inertia=_I(4.333e-05, 3.045e-05, 5.025e-05, 7.1e-06, 6.0e-07, -1.6e-07),
                collisions=[box((0.012, 0.045, 0.012), (0.009, -0.05, 0))],
                visuals=[box((0.012, 0.045, 0.012), (0.009, -0.05, 0))],
            ),
            LinkSpec(
                "Moving_Jaw", "Fixed_Jaw", HINGE, "gripper",
                origin_pos=(-0.0202, -0.0244, 0), origin_quat=_rpy(0, 3.14159, -0.9),
                axis=(0, 0, 1), limit=(-1.1, 1.1), armature=0.01,
                mass=0.0202, com=(-0.0016, -0.0303, 0.00045),
                inertia=_I(1.109e-05, 3.04e-06, 8.99e-06, -5.4e-07, -9.5e-09, -1.7e-07),
                collisions=[box((0.01, 0.035, 0.01), (-0.005, -0.04, 0))],
                visuals=[box((0.01, 0.035, 0.01), (-0.005, -0.04, 0))],
            ),
            LinkSpec(
                "Fixed_Jaw_tip", "Fixed_Jaw", joint_type=3,
                joint_name="Fixed_Jaw_tip_joint", origin_pos=(0.01, -0.097, 0),
                mass=1e-4, inertia=np.full(3, 1e-8),
            ),
    ]
    jmap = dict(zip(JOINT_NAMES, joint_names or JOINT_NAMES))
    import dataclasses as _dc2
    out = []
    for i, l in enumerate(links):
        kw = {}
        kw["name"] = prefix + l.name
        if l.parent is None:
            kw["parent"] = parent
            if parent is not None:
                kw["joint_type"] = FIXED
                kw["joint_name"] = prefix + "Base_mount"
                kw["origin_pos"] = tuple(origin_pos)
                kw["origin_quat"] = tuple(origin_quat)
        else:
            kw["parent"] = prefix + l.parent
        if l.joint_name is not None and l.parent is not None:
            kw["joint_name"] = jmap.get(l.joint_name, prefix + l.joint_name)
        out.append(_dc2.replace(l, **kw))
    return out


class _SO100Mixin:
    """Controller + gripper helpers shared by SO100-family agents."""

    @property
    def _controller_configs(self):
        common_kw = dict(
            joint_names=JOINT_NAMES,
            stiffness=1e3,
            damping=1e2,
            force_limit=100,
        )
        pd_joint_pos = PDJointPosControllerConfig(
            **common_kw, lower=None, upper=None, normalize_action=False
        )
        pd_joint_delta_pos = PDJointPosControllerConfig(
            **common_kw, lower=-0.1, upper=0.1, use_delta=True
        )
        pd_joint_target_delta_pos = PDJointPosControllerConfig(
            **common_kw, lower=-0.1, upper=0.1, use_delta=True, use_target=True
        )
        return dict(
            pd_joint_delta_pos=dict(arm=pd_joint_delta_pos),
            pd_joint_pos=dict(arm=pd_joint_pos),
            pd_joint_target_delta_pos=dict(arm=pd_joint_target_delta_pos),
        )

    def _after_init(self):
        self.tcp = self.robot.links_map["Fixed_Jaw_tip"]
        self.finger1_link = self.robot.links_map["Fixed_Jaw"]
        self.finger2_link = self.robot.links_map["Moving_Jaw"]

    @property
    def tcp_pose(self):
        return self.tcp.pose

    def is_grasping(self, object, min_force=0.5, max_angle=110.0):
        l_forces = self.scene.get_pairwise_contact_forces(self.finger1_link, object)
        r_forces = self.scene.get_pairwise_contact_forces(self.finger2_link, object)
        lforce = jnp.linalg.norm(l_forces, axis=-1)
        rforce = jnp.linalg.norm(r_forces, axis=-1)
        ldirection = quaternion_apply(
            self.finger1_link.pose.q, jnp.array([0.0, -1.0, 0.0])
        )
        rdirection = quaternion_apply(
            self.finger2_link.pose.q, jnp.array([0.0, -1.0, 0.0])
        )
        langle = common.compute_angle_between(ldirection, l_forces)
        rangle = common.compute_angle_between(rdirection, r_forces)
        lflag = (lforce >= min_force) & (jnp.rad2deg(langle) <= max_angle)
        rflag = (rforce >= min_force) & (jnp.rad2deg(rangle) <= max_angle)
        return lflag & rflag

    def is_static(self, threshold: float = 0.2):
        qvel = self.robot.qvel[..., :-1]
        return jnp.max(jnp.abs(qvel), axis=1) <= threshold


@register_agent()
class SO100(_SO100Mixin, BaseAgent):
    uid = "so100"
    fix_root_link = True
    disable_self_collisions = True

    keyframes = dict(
        rest=Keyframe(
            qpos=np.array([0, -1.5708, 1.5708, 0.66, 0, -1.1]),
            pose=np.array([0, 0, 0, 1, 0, 0, 0]),
        ),
        zero=Keyframe(
            qpos=np.zeros(6), pose=np.array([0, 0, 0, 1, 0, 0, 0])
        ),
    )

    def build_description(self):
        b = ArticulationBuilder(self.scene)
        for l in so100_arm_links():
            b.add_link(l)
        return b
