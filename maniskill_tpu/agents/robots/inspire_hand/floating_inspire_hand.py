"""Floating Inspire RH56DFX-2LR hands (counterpart of
mani_skill/agents/robots/inspire_hand/floating_inspire_hand.py:13-430).

20-dof: 6 virtual root joints + 2 wrist + 6 active finger joints + 6
underactuated PIP/IP joints driven passively. Loaded from the in-package
compact URDFs (same joint names/origins/limits as the public description;
primitive capsule/box geometry; see assets/robots/inspire_hand/generate.py).
"""
from __future__ import annotations

import os
from dataclasses import replace

import numpy as np

from .... import PACKAGE_ASSET_DIR
from ...base_agent import BaseAgent, Keyframe
from ...registration import register_agent
from ...controllers import (
    PassiveControllerConfig,
    PDJointPosControllerConfig,
)

_URDF_DIR = os.path.join(PACKAGE_ASSET_DIR, "robots", "inspire_hand")

ROOT_JOINT_NAMES = [
    "root_x_axis_joint",
    "root_y_axis_joint",
    "root_z_axis_joint",
    "root_x_rot_joint",
    "root_y_rot_joint",
    "root_z_rot_joint",
]

# reference floating_inspire_hand.py:77-130 keyframe magic numbers: active
# joints at 0, the underactuated PIP/IP joints rest slightly flexed
_PIP_REST = [-0.16734816, -0.16734803, -0.16734798, -0.167348]
_THUMB_REST = [-0.08147363, -0.07234851]


def _hand_joint_names(side: str):
    p = f"{side}_hand_"
    wrist = [p + "wrist_pitch_joint", p + "wrist_yaw_joint"]
    active = [
        p + "thumb_CMC_yaw_joint",
        p + "thumb_CMC_pitch_joint",
        p + "index_MCP_joint",
        p + "middle_MCP_joint",
        p + "ring_MCP_joint",
        p + "pinky_MCP_joint",
    ]
    passive = [
        p + "thumb_MCP_joint",
        p + "thumb_IP_joint",
        p + "index_PIP_joint",
        p + "middle_PIP_joint",
        p + "ring_PIP_joint",
        p + "pinky_PIP_joint",
    ]
    return wrist, active, passive


class _FloatingInspireHand(BaseAgent):
    side: str = "right"
    fix_root_link = True
    disable_self_collisions = True

    @property
    def tip_link_names(self):
        return [
            f"{self.side}_hand_{f}_tip"
            for f in ("thumb", "index", "middle", "ring", "pinky")
        ]

    @property
    def _controller_configs(self):
        wrist, active, passive = _hand_joint_names(self.side)
        float_pd = PDJointPosControllerConfig(
            joint_names=ROOT_JOINT_NAMES, lower=None, upper=None,
            stiffness=1e3, damping=1e2, force_limit=100,
            normalize_action=False,
        )
        wrist_pd = PDJointPosControllerConfig(
            joint_names=wrist, lower=None, upper=None, stiffness=1e3,
            damping=1e2, force_limit=100, normalize_action=False,
        )
        fingers_pd = PDJointPosControllerConfig(
            joint_names=active, lower=None, upper=None, stiffness=1e3,
            damping=1e2, force_limit=20, normalize_action=False,
        )
        passive_cfg = PassiveControllerConfig(
            joint_names=passive, damping=0.001, force_limit=20
        )
        delta = dict(use_delta=True, normalize_action=True, lower=-0.1,
                     upper=0.1)
        return dict(
            pd_joint_pos=dict(
                root=float_pd, wrist=wrist_pd, fingers=fingers_pd,
                passive=passive_cfg,
            ),
            pd_joint_delta_pos=dict(
                root=replace(float_pd, **delta),
                wrist=replace(wrist_pd, **delta),
                fingers=replace(fingers_pd, **delta),
                passive=passive_cfg,
            ),
        )


def _floating_keyframes(side_sign: float):
    # palm_side / palm_up poses (reference :77-130); qpos order is
    # root(6) + wrist(2) + thumb chain + per-finger chains (tree depth-first
    # matches the URDF declaration order)
    qpos = np.array(
        [0.0] * 8
        + [0.0, 0.0] + [_THUMB_REST[0], _THUMB_REST[1]]
        + sum(([0.0, r] for r in _PIP_REST), [])
    )
    return dict(
        palm_side=Keyframe(
            pose=np.array([0, 0, 0.4,
                           np.cos(-np.pi / 4), 0, 0, np.sin(-np.pi / 4)]),
            qpos=qpos,
        ),
        palm_up=Keyframe(
            pose=np.array([0, 0, 0.4, 0.5, side_sign * 0.5,
                           -side_sign * 0.5, 0.5]),
            qpos=qpos,
        ),
    )


@register_agent()
class FloatingInspireHandRight(_FloatingInspireHand):
    uid = "floating_inspire_hand_right"
    side = "right"
    urdf_path = os.path.join(_URDF_DIR, "inspire_hand_right_floating.urdf")
    keyframes = _floating_keyframes(1.0)


@register_agent()
class FloatingInspireHandLeft(_FloatingInspireHand):
    uid = "floating_inspire_hand_left"
    side = "left"
    urdf_path = os.path.join(_URDF_DIR, "inspire_hand_left_floating.urdf")
    keyframes = _floating_keyframes(-1.0)
