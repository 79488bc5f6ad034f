"""Fixed-base Inspire hands (counterpart of
mani_skill/agents/robots/inspire_hand/fixed_inspire_hand.py:17-120): the same
hand without the 6-dof virtual root (14 dof)."""
from __future__ import annotations

import os
from dataclasses import replace

import numpy as np

from .... import PACKAGE_ASSET_DIR
from ...base_agent import Keyframe
from ...registration import register_agent
from ...controllers import PassiveControllerConfig, PDJointPosControllerConfig
from .floating_inspire_hand import (
    _PIP_REST,
    _THUMB_REST,
    _FloatingInspireHand,
    _hand_joint_names,
)

_URDF_DIR = os.path.join(PACKAGE_ASSET_DIR, "robots", "inspire_hand")


def _fixed_keyframes(side_sign: float):
    qpos = np.array(
        [0.0, 0.0] + [0.0, 0.0] + [_THUMB_REST[0], _THUMB_REST[1]]
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


class _FixedInspireHand(_FloatingInspireHand):
    @property
    def _controller_configs(self):
        wrist, active, passive = _hand_joint_names(self.side)
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
                wrist=wrist_pd, fingers=fingers_pd, passive=passive_cfg
            ),
            pd_joint_delta_pos=dict(
                wrist=replace(wrist_pd, **delta),
                fingers=replace(fingers_pd, **delta),
                passive=passive_cfg,
            ),
        )


@register_agent()
class FixedInspireHandRight(_FixedInspireHand):
    uid = "fixed_inspire_hand_right"
    side = "right"
    urdf_path = os.path.join(_URDF_DIR, "inspire_hand_right.urdf")
    keyframes = _fixed_keyframes(1.0)


@register_agent()
class FixedInspireHandLeft(_FixedInspireHand):
    uid = "fixed_inspire_hand_left"
    side = "left"
    urdf_path = os.path.join(_URDF_DIR, "inspire_hand_left.urdf")
    keyframes = _fixed_keyframes(-1.0)
