"""Full Unitree G1 humanoid + simplified-upper-body variants (counterparts of
mani_skill/agents/robots/unitree_g1/g1.py:12-120 and g1_upper_body.py:16-392).

37-dof whole body (12 leg + torso + 10 arm + 14 rubber-hand joints) from the
in-package compact URDF (generate_g1.py; public g1_description frames).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from .... import PACKAGE_ASSET_DIR
from ...base_agent import BaseAgent, Keyframe
from ...registration import register_agent
from ...controllers import PassiveControllerConfig, PDJointPosControllerConfig
from ....sensors.camera import CameraConfig

_DIR = os.path.join(PACKAGE_ASSET_DIR, "robots", "unitree_g1")

_LEG = ["hip_pitch", "hip_roll", "hip_yaw", "knee", "ankle_pitch",
        "ankle_roll"]
_ARM = ["shoulder_pitch", "shoulder_roll", "shoulder_yaw", "elbow_pitch",
        "elbow_roll"]
_HAND = ["zero", "one", "two", "three", "four", "five", "six"]

# URDF declaration order (generate_g1.py): legs L, legs R, torso,
# (arm + hand) L, (arm + hand) R
FULL_JOINT_NAMES = (
    [f"left_{j}_joint" for j in _LEG]
    + [f"right_{j}_joint" for j in _LEG]
    + ["torso_joint"]
    + [f"left_{j}_joint" for j in _ARM + _HAND]
    + [f"right_{j}_joint" for j in _ARM + _HAND]
)

# reference g1.py standing keyframe values, keyed by joint name (the
# reference array is in SAPIEN BFS order; values here are order-free)
_STANDING = {n: 0.0 for n in FULL_JOINT_NAMES}
_STANDING.update({
    "left_shoulder_roll_joint": 0.2, "right_shoulder_roll_joint": -0.2,
    "left_elbow_pitch_joint": 0.9, "right_elbow_pitch_joint": 0.9,
    "left_zero_joint": 0.0, "right_zero_joint": 0.0,
    "left_one_joint": 0.1, "right_one_joint": -0.1,
    "left_two_joint": 0.92, "right_two_joint": -0.92,
    "left_three_joint": -0.77, "right_three_joint": 0.77,
    "left_four_joint": -0.92, "right_four_joint": 0.92,
    "left_five_joint": -0.77, "right_five_joint": 0.77,
    "left_six_joint": -0.92, "right_six_joint": 0.92,
})


def _kf(names, overrides=None):
    vals = dict(_STANDING)
    vals.update(overrides or {})
    return np.array([vals[n] for n in names])


@register_agent()
class UnitreeG1(BaseAgent):
    uid = "unitree_g1"
    urdf_path = os.path.join(_DIR, "g1.urdf")
    fix_root_link = False
    disable_self_collisions = True

    body_joints = FULL_JOINT_NAMES
    body_stiffness = 50
    body_damping = 1
    body_force_limit = 100

    keyframes = dict(
        standing=Keyframe(
            pose=np.array([0, 0, 0.755, 1, 0, 0, 0]),
            qpos=_kf(FULL_JOINT_NAMES),
        ),
        right_knee_up=Keyframe(
            pose=np.array([0, 0, 0.755, 1, 0, 0, 0]),
            qpos=_kf(FULL_JOINT_NAMES, {"right_hip_pitch_joint": -1.5,
                                        "right_knee_joint": 1.5}),
        ),
        left_knee_up=Keyframe(
            pose=np.array([0, 0, 0.755, 1, 0, 0, 0]),
            qpos=_kf(FULL_JOINT_NAMES, {"left_hip_pitch_joint": -1.5,
                                        "left_knee_joint": 1.5}),
        ),
    )

    @property
    def _controller_configs(self):
        pd = PDJointPosControllerConfig(
            joint_names=list(self.body_joints), lower=None, upper=None,
            stiffness=self.body_stiffness, damping=self.body_damping,
            force_limit=self.body_force_limit, normalize_action=False,
        )
        delta = PDJointPosControllerConfig(
            joint_names=list(self.body_joints), lower=-0.2, upper=0.2,
            stiffness=self.body_stiffness, damping=self.body_damping,
            force_limit=self.body_force_limit, use_delta=True,
        )
        return dict(
            pd_joint_pos=dict(body=pd, balance_passive_force=False),
            pd_joint_delta_pos=dict(body=delta, balance_passive_force=False),
        )

    def is_standing(self):
        z = self.robot.pose.p[:, 2]
        return (z > 0.5) & (z < 1.0)

    def is_fallen(self):
        return self.robot.pose.p[:, 2] < 0.3


UPPER_JOINT_NAMES = (
    ["torso_joint"]
    + [f"left_{j}_joint" for j in _ARM + _HAND]
    + [f"right_{j}_joint" for j in _ARM + _HAND]
)


@register_agent()
class UnitreeG1UpperBody(BaseAgent):
    """Fixed-base upper-body-only variant used for tabletop humanoid
    manipulation (reference g1_upper_body.py:16-290; legs are welded)."""

    uid = "unitree_g1_simplified_upper_body"
    urdf_path = os.path.join(_DIR, "g1_simplified_upper_body.urdf")
    fix_root_link = True
    disable_self_collisions = True

    body_joints = UPPER_JOINT_NAMES
    body_stiffness = 1e3
    body_damping = 1e2
    body_force_limit = 100

    keyframes = dict(
        standing=Keyframe(
            pose=np.array([0, 0, 0.755, 1, 0, 0, 0]),
            qpos=np.zeros(len(UPPER_JOINT_NAMES)),
        )
    )

    @property
    def _controller_configs(self):
        pd = PDJointPosControllerConfig(
            joint_names=list(self.body_joints), lower=None, upper=None,
            stiffness=self.body_stiffness, damping=self.body_damping,
            force_limit=self.body_force_limit, normalize_action=False,
        )
        delta = PDJointPosControllerConfig(
            joint_names=list(self.body_joints), lower=-0.2, upper=0.2,
            stiffness=self.body_stiffness, damping=self.body_damping,
            force_limit=self.body_force_limit, use_delta=True,
        )
        cfgs = dict(
            pd_joint_pos=dict(body=pd),
            pd_joint_delta_pos=dict(body=delta),
        )
        passive_joints = [
            n for n in self._all_active_joints() if n not in self.body_joints
        ]
        if passive_joints:
            passive = PassiveControllerConfig(
                joint_names=passive_joints, damping=1.0, force_limit=100
            )
            for c in cfgs.values():
                c["passive"] = passive
        return cfgs

    def _all_active_joints(self):
        return UPPER_JOINT_NAMES

    @property
    def left_tcp(self):
        return self.robot.links_map["left_palm_link"]

    @property
    def right_tcp(self):
        return self.robot.links_map["right_palm_link"]

    # -- grasp helpers (reference g1_upper_body.py:146-290) ---------------

    def _finger_joint_indexes(self, side: str):
        names = [j.name for j in self.robot.active_joints]
        return [names.index(f"{side}_{k}_joint") for k in _HAND]

    @property
    def left_finger_joint_indexes(self):
        return self._finger_joint_indexes("left")

    @property
    def right_finger_joint_indexes(self):
        return self._finger_joint_indexes("right")

    def right_hand_dist_to_open_grasp(self):
        """Mean |qpos| of the right-hand joints — 0 when the hand is fully
        open (reference g1_upper_body.py:184-188)."""
        idx = jnp.asarray(self.right_finger_joint_indexes)
        return jnp.mean(jnp.abs(self.robot.qpos[:, idx]), axis=1)

    def left_hand_dist_to_open_grasp(self):
        idx = jnp.asarray(self.left_finger_joint_indexes)
        return jnp.mean(jnp.abs(self.robot.qpos[:, idx]), axis=1)

    def _hand_is_grasping(self, side, obj, min_force=0.5, max_angle=85.0):
        """Opposed-contact grasp test: thumb chain (index-finger pair in the
        rubber hand) and the two-finger chain must both press on the object
        with contact force directions within max_angle of each side's closing
        direction (reference g1_upper_body.py:196-290, expressed with the
        palm y axis as the closing axis of the three-finger rubber hand)."""
        from ....utils import common
        from ....utils.geometry.rotation_conversions import quaternion_apply

        thumb = self.robot.links_map[f"{side}_five_link"]
        finger = self.robot.links_map[f"{side}_three_link"]
        f_thumb = self.scene.get_pairwise_contact_forces(thumb, obj)
        f_finger = self.scene.get_pairwise_contact_forces(finger, obj)
        lforce = jnp.linalg.norm(f_thumb, axis=-1)
        rforce = jnp.linalg.norm(f_finger, axis=-1)
        sgn = 1.0 if side == "left" else -1.0
        palm_q = self.robot.links_map[f"{side}_palm_link"].pose.q
        ldir = quaternion_apply(palm_q, jnp.array([0.0, -sgn, 0.0]))
        rdir = quaternion_apply(palm_q, jnp.array([0.0, sgn, 0.0]))
        langle = common.compute_angle_between(ldir, f_thumb)
        rangle = common.compute_angle_between(rdir, f_finger)
        lflag = (lforce >= min_force) & (jnp.rad2deg(langle) <= max_angle)
        rflag = (rforce >= min_force) & (jnp.rad2deg(rangle) <= max_angle)
        return lflag & rflag

    def right_hand_is_grasping(self, obj, min_force=0.5, max_angle=85.0):
        return self._hand_is_grasping("right", obj, min_force, max_angle)

    def left_hand_is_grasping(self, obj, min_force=0.5, max_angle=85.0):
        return self._hand_is_grasping("left", obj, min_force, max_angle)


@register_agent()
class UnitreeG1UpperBodyWithHeadCamera(UnitreeG1UpperBody):
    uid = "unitree_g1_simplified_upper_body_with_head_camera"

    @property
    def _sensor_configs(self):
        # head camera pitched down 30 deg (reference g1_upper_body.py:296-309)
        q = np.array([np.cos(np.pi / 12), 0, np.sin(np.pi / 12), 0])
        return [
            CameraConfig(
                uid="head_camera",
                pose=np.concatenate([[0.05, 0, 0.46], q]),
                width=128, height=128, fov=np.pi / 2, near=0.01, far=100,
                mount=self.robot.links_map["torso_link"],
            )
        ]


@register_agent()
class UnitreeG1UpperBodyRightArm(UnitreeG1UpperBody):
    """Right-arm-only control; all other joints run passive
    (reference g1_upper_body.py:312-392)."""

    uid = "unitree_g1_simplified_upper_body_right_arm"

    body_joints = (
        [f"right_{j}_joint" for j in _ARM]
        + [f"right_{j}_joint" for j in _HAND]
    )
