"""WidowX-250S agents (counterpart of mani_skill/agents/robots/widowx/widowx.py
and the Real2Sim-tuned bridge-dataset variants registered in
mani_skill/envs/tasks/digital_twins/bridge_dataset_eval/base_env.py:28-151).

The arm shares the compact Trossen-WidowX description used by WidowXAI (the
public WX-250S and widowx-ai geometry differ mainly in the mount plate;
joint names/limits match). The bridge variants pin the exact BridgeData v2
evaluation cameras (Logitech C920 intrinsics, base_link-mounted poses) and
the SIMPLER real2sim-tuned PD gains.
"""
from __future__ import annotations

import numpy as np

from ...registration import register_agent
from ...controllers import (
    PDEEPoseControllerConfig,
    PDJointPosMimicControllerConfig,
)
from ....sensors.camera import CameraConfig
from ..widowxai.widowxai import (
    ARM_JOINT_NAMES,
    GRIPPER_JOINT_NAMES,
    WidowXAI,
)

# Logitech C920 intrinsics used for all bridge eval cameras
# (reference base_env.py:53-55)
BRIDGE_INTRINSIC = np.array(
    [[623.588, 0, 319.501], [0, 623.588, 239.545], [0, 0, 1]]
)


@register_agent()
class WidowX250S(WidowXAI):
    uid = "widowx250s"


@register_agent()
class WidowX250SBridgeDatasetFlatTable(WidowX250S):
    """Real2Sim tuned WidowX250S for the flat-table bridge setup
    (reference base_env.py:28-125)."""

    uid = "widowx250s_bridgedataset_flat_table"

    # SIMPLER-tuned gains (reference base_env.py:59-89)
    arm_stiffness = np.array(
        [1169.79, 730.0, 808.46, 1229.13, 1272.28, 1056.33]
    )
    arm_damping = np.array([330.0, 180.0, 152.12, 309.62, 201.05, 269.51])
    arm_force_limit = np.array([200, 200, 100, 100, 100, 100])
    gripper_stiffness = 1000.0
    gripper_damping = 200.0
    gripper_force_limit = 60.0

    @property
    def _sensor_configs(self):
        # the camera used in the Bridge dataset (reference base_env.py:42-57)
        return [
            CameraConfig(
                uid="3rd_view_camera",
                pose=np.array(
                    [0.00, -0.16, 0.36,
                     0.8992917, -0.09263245, 0.35892478, 0.23209205]
                ),
                width=640,
                height=480,
                intrinsic=BRIDGE_INTRINSIC,
                near=0.01,
                far=10,
                mount=self.robot.links_map["base_link"],
            )
        ]

    @property
    def _controller_configs(self):
        # reference base_env.py:91-125: unnormalized EE target-delta pose +
        # mimic gripper with extra clearance
        extra_gripper_clearance = 0.001
        arm = PDEEPoseControllerConfig(
            joint_names=ARM_JOINT_NAMES,
            pos_lower=-1.0,
            pos_upper=1.0,
            rot_lower=-np.pi / 2,
            rot_upper=np.pi / 2,
            stiffness=self.arm_stiffness,
            damping=self.arm_damping,
            force_limit=self.arm_force_limit,
            ee_link="ee_gripper_link",
            use_delta=True,
            use_target=True,
            normalize_action=False,
        )
        gripper = PDJointPosMimicControllerConfig(
            joint_names=GRIPPER_JOINT_NAMES,
            lower=0.015 - extra_gripper_clearance,
            upper=0.037 + extra_gripper_clearance,
            stiffness=self.gripper_stiffness,
            damping=self.gripper_damping,
            force_limit=self.gripper_force_limit,
            normalize_action=True,
        )
        return dict(
            arm_pd_ee_target_delta_pose_align2_gripper_pd_joint_pos=dict(
                arm=arm, gripper=gripper
            )
        )


@register_agent()
class WidowX250SBridgeDatasetSink(WidowX250SBridgeDatasetFlatTable):
    """Sink-setup camera variant (reference base_env.py:129-151)."""

    uid = "widowx250s_bridgedataset_sink"

    @property
    def _sensor_configs(self):
        return [
            CameraConfig(
                uid="3rd_view_camera",
                pose=np.array(
                    [-0.00300001, -0.21, 0.39,
                     -0.907313, 0.0782, -0.36434, -0.194741]
                ),
                width=640,
                height=480,
                intrinsic=BRIDGE_INTRINSIC,
                near=0.01,
                far=10,
                mount=self.robot.links_map["base_link"],
            )
        ]
