from .xarm7 import XArm7
