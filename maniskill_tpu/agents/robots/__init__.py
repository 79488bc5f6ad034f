from .panda.panda import Panda
from .panda.panda_wristcam import PandaWristCam
from .so100.so100 import SO100
from .dclaw.dclaw import DClaw
from .floating_panda_gripper.floating_panda_gripper import FloatingPandaGripper
from .fetch.fetch import Fetch
from .allegro_hand.allegro import AllegroHandRight, AllegroHandRightTouch
