from .panda.panda import Panda
from .panda.panda_wristcam import PandaWristCam
from .panda.panda_stick import PandaStick
from .so100.so100 import SO100
from .dclaw.dclaw import DClaw
from .floating_panda_gripper.floating_panda_gripper import FloatingPandaGripper
from .fetch.fetch import Fetch
from .allegro_hand.allegro import AllegroHandRight, AllegroHandRightTouch
from .trifingerpro.trifingerpro import TriFingerPro
from .anymal.anymal_c import ANYmalC
from .unitree_go.unitree_go2 import UnitreeGo2, UnitreeGo2Simplified
from .unitree_h1.h1 import UnitreeH1, UnitreeH1Simplified
from .unitree_g1.g1 import UnitreeG1Simplified
from .xarm6.xarm6_robotiq import XArm6Robotiq
from .xarm6.xarm6_nogripper import XArm6NoGripper
from .ur_e.ur_10e import UR10e
from .widowxai.widowxai import WidowXAI
from .koch.koch import Koch
from .xarm.xarm7 import XArm7
from .floating_robotiq.floating_robotiq import FloatingRobotiq2F85Gripper
from .widowx.widowx250s import (
    WidowX250S,
    WidowX250SBridgeDatasetFlatTable,
    WidowX250SBridgeDatasetSink,
)
from .inspire_hand import (
    FixedInspireHandLeft,
    FixedInspireHandRight,
    FloatingInspireHandLeft,
    FloatingInspireHandRight,
)
from .floating_ability_hand import FloatingAbilityHandRight
from .xarm.xarm7_ability import XArm7Ability
from .widowxai.widowxai_wristcam import WidowXAIWristCam
from .xarm6.xarm6_wristcam import XArm6NoGripperWristCamera, XArm6RobotiqWristCamera
from .allegro_hand.allegro import AllegroHandLeft
from .stompy import Stompy
from .googlerobot import GoogleRobot
from .xlerobot import Xlerobot
from .lerobot import LeRobotRealAgent
