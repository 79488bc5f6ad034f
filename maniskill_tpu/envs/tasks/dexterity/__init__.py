from .rotate_valve import RotateValveEnv
