"""TriFingerPro agent (counterpart of
mani_skill/agents/robots/trifingerpro/trifingerpro.py:15-214).

Three 3-dof fingers at 120-degree spacing; loaded from the in-package
compact URDF (exercises the URDF loader path rather than a procedural
build_description).
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .... import PACKAGE_ASSET_DIR
from ...base_agent import BaseAgent, Keyframe
from ...registration import register_agent
from ...controllers import PDJointPosControllerConfig, PDJointVelControllerConfig

JOINT_NAMES = [
    "finger_base_to_upper_joint_0",
    "finger_upper_to_middle_joint_0",
    "finger_middle_to_lower_joint_0",
    "finger_base_to_upper_joint_120",
    "finger_upper_to_middle_joint_120",
    "finger_middle_to_lower_joint_120",
    "finger_base_to_upper_joint_240",
    "finger_upper_to_middle_joint_240",
    "finger_middle_to_lower_joint_240",
]

TIP_LINK_NAMES = [
    "finger_tip_link_0",
    "finger_tip_link_120",
    "finger_tip_link_240",
]


@register_agent()
class TriFingerPro(BaseAgent):
    uid = "trifingerpro"
    urdf_path = os.path.join(
        PACKAGE_ASSET_DIR, "robots", "trifinger", "trifingerpro.urdf"
    )
    fix_root_link = True
    disable_self_collisions = True

    joint_stiffness = 1e2
    joint_damping = 1e1
    joint_force_limit = 2e1

    keyframes = dict(
        rest=Keyframe(
            qpos=np.array([0.0, 0.9, -1.7] * 3),
            pose=np.array([0, 0, 0, 1, 0, 0, 0]),
        )
    )

    @property
    def _controller_configs(self):
        common_kw = dict(
            joint_names=JOINT_NAMES,
            stiffness=self.joint_stiffness,
            damping=self.joint_damping,
            force_limit=self.joint_force_limit,
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
        pd_joint_vel = PDJointVelControllerConfig(
            joint_names=JOINT_NAMES,
            lower=-1.0,
            upper=1.0,
            damping=self.joint_damping,
            force_limit=self.joint_force_limit,
        )
        return dict(
            pd_joint_delta_pos=dict(arm=pd_joint_delta_pos),
            pd_joint_pos=dict(arm=pd_joint_pos),
            pd_joint_target_delta_pos=dict(arm=pd_joint_target_delta_pos),
            pd_joint_vel=dict(arm=pd_joint_vel),
        )

    def _after_init(self):
        self.tip_links = [self.robot.links_map[n] for n in TIP_LINK_NAMES]

    @property
    def tip_poses(self):
        """Tip poses stacked on the last axis: (B, 7, 3 fingers)
        (trifingerpro.py tip_poses parity)."""
        return jnp.stack([l.pose.raw_pose for l in self.tip_links], axis=-1)

    @property
    def tcp_pose(self):
        return self.tip_links[0].pose

    def is_grasping(self, object=None, min_force=0.5, max_angle=85):
        """At least two finger tips pressing the object."""
        forces = [
            jnp.linalg.norm(
                self.scene.get_pairwise_contact_forces(l, object), axis=-1
            )
            for l in self.tip_links
        ]
        pressing = sum((f >= min_force).astype(jnp.int32) for f in forces)
        return pressing >= 2

    def is_static(self, threshold: float = 0.2):
        return jnp.max(jnp.abs(self.robot.qvel), axis=1) <= threshold
