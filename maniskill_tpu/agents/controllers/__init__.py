from .base_controller import (
    BaseController,
    CombinedController,
    ControllerConfig,
    DictController,
)
from .pd_joint_pos import (
    PDJointPosController,
    PDJointPosControllerConfig,
    PDJointPosMimicController,
    PDJointPosMimicControllerConfig,
)
from .pd_joint_vel import PDJointVelController, PDJointVelControllerConfig
from .passive_controller import PassiveController, PassiveControllerConfig
from .pd_ee_pose import (
    PDEEPosController,
    PDEEPosControllerConfig,
    PDEEPoseController,
    PDEEPoseControllerConfig,
)

__all__ = [
    "BaseController", "CombinedController", "ControllerConfig", "DictController",
    "PDJointPosController", "PDJointPosControllerConfig",
    "PDJointPosMimicController", "PDJointPosMimicControllerConfig",
    "PDJointVelController", "PDJointVelControllerConfig",
    "PassiveController", "PassiveControllerConfig",
    "PDEEPosController", "PDEEPosControllerConfig",
    "PDEEPoseController", "PDEEPoseControllerConfig",
]


def deepcopy_dict(d):
    import copy

    return copy.deepcopy(d)
