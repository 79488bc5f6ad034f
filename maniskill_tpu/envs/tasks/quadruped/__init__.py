from .quadruped_reach import QuadrupedReachEnv
from .quadruped_spin import QuadrupedSpinEnv
