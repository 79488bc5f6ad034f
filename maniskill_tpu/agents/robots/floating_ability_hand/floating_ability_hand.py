"""Floating PSYONIC Ability hand (counterpart of
mani_skill/agents/robots/floating_ability_hand/floating_ability_hand.py:14-230).

16 dof: 6 virtual root joints + thumb (q1, q2) + four fingers (q1 active,
q2 mimicking q1 with the linkage ratio 1.05851325 x + 0.72349796). Loaded
from the in-package compact URDF (assets/robots/ability_hand/generate.py).
"""
from __future__ import annotations

import os

import numpy as np

from .... import PACKAGE_ASSET_DIR
from ...base_agent import BaseAgent, Keyframe
from ...registration import register_agent
from ...controllers import (
    PDJointPosControllerConfig,
    PDJointPosMimicControllerConfig,
)

ROOT_JOINT_NAMES = [
    "root_x_axis_joint",
    "root_y_axis_joint",
    "root_z_axis_joint",
    "root_x_rot_joint",
    "root_y_rot_joint",
    "root_z_rot_joint",
]
FINGERS = ["index", "middle", "ring", "pinky"]
MIMIC = {
    f"{f}_q2": dict(joint=f"{f}_q1", multiplier=1.05851325, offset=0.72349796)
    for f in FINGERS
}


@register_agent()
class FloatingAbilityHandRight(BaseAgent):
    uid = "floating_ability_hand_right"
    urdf_path = os.path.join(
        PACKAGE_ASSET_DIR, "robots", "ability_hand",
        "ability_hand_right_floating.urdf",
    )
    fix_root_link = True
    disable_self_collisions = True

    keyframes = dict(
        rest=Keyframe(qpos=np.zeros(16), pose=np.array([0, 0, 0, 1, 0, 0, 0]))
    )

    hand_stiffness = 1e3
    hand_damping = 1e2
    hand_force_limit = 50

    tip_link_names = [f"{f}_tip" for f in ["thumb"] + FINGERS]
    palm_link_name = "thumb_base"

    @property
    def _controller_configs(self):
        float_pd = PDJointPosControllerConfig(
            joint_names=ROOT_JOINT_NAMES, lower=None, upper=None,
            stiffness=1e3, damping=1e2, force_limit=100,
            normalize_action=False,
        )
        hand_pd = PDJointPosMimicControllerConfig(
            joint_names=[f"{f}_q1" for f in FINGERS]
            + [f"{f}_q2" for f in FINGERS],
            lower=None, upper=None, stiffness=self.hand_stiffness,
            damping=self.hand_damping, force_limit=self.hand_force_limit,
            mimic=MIMIC, normalize_action=False,
        )
        thumb_pd = PDJointPosControllerConfig(
            joint_names=["thumb_q1", "thumb_q2"], lower=None, upper=None,
            stiffness=self.hand_stiffness, damping=self.hand_damping,
            force_limit=self.hand_force_limit, normalize_action=False,
        )
        return dict(
            pd_joint_pos=dict(root=float_pd, hand=hand_pd, thumb=thumb_pd),
        )
