"""Stompy humanoid (counterpart of
mani_skill/agents/robots/stompy/stompy.py:12-136).

The reference loads a downloaded K-Scale Labs URDF (not bundled); this
compact build keeps the uid, free root, head camera mount, gripper link
roles, and the generic all-active-joint controller semantics over a 35-dof
primitive-geometry body (assets/robots/stompy/generate.py).
"""
from __future__ import annotations

import os

import numpy as np

from .... import PACKAGE_ASSET_DIR
from ...base_agent import BaseAgent, Keyframe
from ...registration import register_agent
from ...controllers import PDJointPosControllerConfig
from ....sensors.camera import CameraConfig


@register_agent()
class Stompy(BaseAgent):
    uid = "stompy"
    urdf_path = os.path.join(
        PACKAGE_ASSET_DIR, "robots", "stompy", "stompy.urdf"
    )
    fix_root_link = False
    disable_self_collisions = True

    @property
    def _controller_configs(self):
        names = [j.name for j in self.robot.active_joints]
        return dict(
            pd_joint_pos=dict(
                body=PDJointPosControllerConfig(
                    joint_names=names, lower=None, upper=None, stiffness=100,
                    damping=10, normalize_action=False,
                ),
                balance_passive_force=False,
            ),
            pd_joint_delta_pos=dict(
                body=PDJointPosControllerConfig(
                    joint_names=names, lower=-0.1, upper=0.1, stiffness=20,
                    damping=5, normalize_action=True, use_delta=True,
                ),
                balance_passive_force=False,
            ),
        )

    keyframes = dict(
        standing=Keyframe(
            pose=np.array([0, 0, 0.78, 1, 0, 0, 0]),
            qpos=np.zeros(35),
        )
    )

    @property
    def _sensor_configs(self):
        # head camera looking forward (reference stompy.py:118-133)
        q = np.array([0.5, -0.5, 0.5, -0.5])  # -pi/2 about x
        return [
            CameraConfig(
                uid="head_camera",
                pose=np.concatenate([[0.12, 0, 0.02], q]),
                width=128, height=128, fov=1.57, near=0.01, far=100,
                mount=self.robot.links_map["link_head_1_head_1"],
            )
        ]
