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
from .pd_joint_pos_vel import PDJointPosVelController, PDJointPosVelControllerConfig
from .pd_base_vel import (
    PDBaseForwardVelController,
    PDBaseForwardVelControllerConfig,
    PDBaseVelController,
    PDBaseVelControllerConfig,
)
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
    "PDJointPosVelController", "PDJointPosVelControllerConfig",
    "PDBaseVelController", "PDBaseVelControllerConfig",
    "PDBaseForwardVelController", "PDBaseForwardVelControllerConfig",
]


def deepcopy_dict(d):
    import copy

    return copy.deepcopy(d)
