from .rotate_valve import RotateValveEnv
from .rotate_single_object_in_hand import RotateSingleObjectInHandLevel0
from .rotate_cube import RotateCubeEnv
from .insert_flower import InsertFlowerEnv
