"""PandaStick: Panda arm with a drawing stick instead of the gripper
(counterpart of mani_skill/agents/robots/panda/panda_stick.py:18-120).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ....building.articulation_builder import ArticulationBuilder, LinkSpec, ShapeSpec
from ....physics.types import CAPSULE
from ...registration import register_agent
from ...base_agent import Keyframe
from ...controllers import PDJointPosControllerConfig, PDEEPosControllerConfig
from .panda import ARM_JOINT_NAMES, Panda


@register_agent()
class PandaStick(Panda):
    uid = "panda_stick"

    keyframes = dict(
        rest=Keyframe(
            qpos=np.array(
                [0.0, np.pi / 8, 0, -np.pi * 5 / 8, 0, np.pi * 3 / 4, np.pi / 4]
            ),
            pose=np.array([0, 0, 0, 1, 0, 0, 0]),
        )
    )

    def build_description(self) -> ArticulationBuilder:
        b = ArticulationBuilder(self.scene)
        links = self._arm_link_specs()
        # replace the gripper with a slim stick below the hand; the tcp frame
        # (panda_hand_tcp at +0.1034) IS the stick tip: the capsule's lower
        # sphere center sits at tcp_z - radius so the collision surface ends
        # exactly at the TCP, matching the reference panda_stick.urdf where
        # the cylinder tip coincides with panda_hand_tcp
        # (mani_skill/assets/robots/panda/panda_stick.urdf:224-245). A tip
        # that overshoots the TCP makes the drawing tasks' touch test
        # (tcp_z < canvas+dot+5mm) unreachable under contact.
        tip_z = 0.1034
        r, hl = 0.008, 0.025
        stick_pos = (0, 0, tip_z - hl - r)
        for spec in links:
            if spec.name == "panda_hand":
                spec.collisions = list(spec.collisions) + [
                    ShapeSpec(CAPSULE, [r, hl, 0], stick_pos, (1, 0, 0, 0))
                ]
                spec.visuals = list(spec.visuals) + [
                    ShapeSpec(CAPSULE, [r, hl, 0], stick_pos, (1, 0, 0, 0))
                ]
        for l in links:
            b.add_link(l)
        return b

    @property
    def _controller_configs(self):
        arm_common = dict(
            joint_names=ARM_JOINT_NAMES,
            stiffness=self.arm_stiffness,
            damping=self.arm_damping,
            force_limit=self.arm_force_limit,
        )
        arm_pd_joint_pos = PDJointPosControllerConfig(
            **arm_common, lower=None, upper=None, normalize_action=False
        )
        arm_pd_joint_delta_pos = PDJointPosControllerConfig(
            **arm_common, lower=-0.1, upper=0.1, use_delta=True
        )
        arm_pd_ee_delta_pos = PDEEPosControllerConfig(
            **arm_common, pos_lower=-0.1, pos_upper=0.1,
            ee_link="panda_hand_tcp", use_delta=True,
        )
        return dict(
            pd_joint_delta_pos=dict(arm=arm_pd_joint_delta_pos),
            pd_joint_pos=dict(arm=arm_pd_joint_pos),
            pd_ee_delta_pos=dict(arm=arm_pd_ee_delta_pos),
        )

    def _after_init(self):
        self.tcp = self.robot.links_map["panda_hand_tcp"]

    def is_grasping(self, object=None, min_force=0.5, max_angle=85):
        return jnp.zeros(self.scene.num_envs, bool)

    def is_static(self, threshold: float = 0.2):
        return jnp.max(jnp.abs(self.robot.qvel), axis=1) <= threshold
