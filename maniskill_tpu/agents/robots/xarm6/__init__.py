from .xarm6_robotiq import XArm6Robotiq
from .xarm6_nogripper import XArm6NoGripper
