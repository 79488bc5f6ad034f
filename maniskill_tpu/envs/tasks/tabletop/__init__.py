from .push_cube import PushCubeEnv
from .pick_cube import PickCubeEnv
