"""xArm7 (counterpart of mani_skill/agents/robots/xarm/xarm7_ability.py).

Loaded from the in-package compact URDF (public xarm_description frames).
The reference pairs the arm with a 10-dof Ability hand; this build ships a
simplified two-finger mimic gripper (same grasp/action semantics as the
panda-class grippers) until a dexterous-hand variant lands.
"""
from __future__ import annotations

import os

import numpy as np
import jax.numpy as jnp

from .... import PACKAGE_ASSET_DIR
from ...base_agent import BaseAgent, Keyframe
from ...registration import register_agent
from ...controllers import (
    PDJointPosControllerConfig,
    PDJointPosMimicControllerConfig,
    PDEEPoseControllerConfig,
)
from ....utils import common
from ....utils.geometry.rotation_conversions import quaternion_apply

ARM_JOINT_NAMES = [f"joint{i}" for i in range(1, 8)]
GRIPPER_JOINT_NAMES = ["left_driver_joint", "right_driver_joint"]


@register_agent()
class XArm7(BaseAgent):
    uid = "xarm7"
    urdf_path = os.path.join(PACKAGE_ASSET_DIR, "robots", "xarm7", "xarm7.urdf")
    fix_root_link = True
    disable_self_collisions = True

    keyframes = dict(
        rest=Keyframe(
            qpos=np.array([0, 0.2, 0, 0.6, 0, 0.4, 0, 0.0, 0.0]),
            pose=np.array([0, 0, 0, 1, 0, 0, 0]),
        )
    )

    arm_stiffness = 1e3
    arm_damping = 1e2
    arm_force_limit = 100
    gripper_stiffness = 1e3
    gripper_damping = 1e2
    gripper_force_limit = 60

    @property
    def _controller_configs(self):
        arm_common = dict(
            joint_names=ARM_JOINT_NAMES,
            stiffness=self.arm_stiffness,
            damping=self.arm_damping,
            force_limit=self.arm_force_limit,
        )
        pd_joint_pos = PDJointPosControllerConfig(
            **arm_common, lower=None, upper=None, normalize_action=False
        )
        pd_joint_delta_pos = PDJointPosControllerConfig(
            **arm_common, lower=-0.1, upper=0.1, use_delta=True
        )
        pd_ee_delta_pose = PDEEPoseControllerConfig(
            **arm_common, pos_lower=-0.1, pos_upper=0.1,
            rot_lower=-0.1, rot_upper=0.1, ee_link="link_tcp", use_delta=True,
        )
        gripper = PDJointPosMimicControllerConfig(
            joint_names=GRIPPER_JOINT_NAMES,
            lower=0.0,
            upper=0.04,
            stiffness=self.gripper_stiffness,
            damping=self.gripper_damping,
            force_limit=self.gripper_force_limit,
        )
        return dict(
            pd_joint_delta_pos=dict(arm=pd_joint_delta_pos, gripper=gripper),
            pd_joint_pos=dict(arm=pd_joint_pos, gripper=gripper),
            pd_ee_delta_pose=dict(arm=pd_ee_delta_pose, gripper=gripper),
        )

    def _after_init(self):
        self.tcp = self.robot.links_map["link_tcp"]
        self.finger1_link = self.robot.links_map["left_pad"]
        self.finger2_link = self.robot.links_map["right_pad"]

    @property
    def tcp_pose(self):
        return self.tcp.pose

    def is_grasping(self, object, min_force=0.5, max_angle=85.0):
        l_forces = self.scene.get_pairwise_contact_forces(self.finger1_link, object)
        r_forces = self.scene.get_pairwise_contact_forces(self.finger2_link, object)
        lforce = jnp.linalg.norm(l_forces, axis=-1)
        rforce = jnp.linalg.norm(r_forces, axis=-1)
        ldir = quaternion_apply(self.finger1_link.pose.q, jnp.asarray([0.0, -1.0, 0]))
        rdir = quaternion_apply(self.finger2_link.pose.q, jnp.asarray([0.0, 1.0, 0]))
        langle = common.compute_angle_between(ldir, l_forces)
        rangle = common.compute_angle_between(rdir, r_forces)
        return (
            (lforce >= min_force)
            & (jnp.rad2deg(langle) <= max_angle)
            & (rforce >= min_force)
            & (jnp.rad2deg(rangle) <= max_angle)
        )

    def is_static(self, threshold: float = 0.2):
        return jnp.max(jnp.abs(self.robot.qvel[..., :-2]), axis=1) <= threshold
