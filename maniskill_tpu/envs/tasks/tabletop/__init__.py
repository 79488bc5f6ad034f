from .push_cube import PushCubeEnv
from .pick_cube import PickCubeEnv
from .pull_cube import PullCubeEnv
from .stack_cube import StackCubeEnv
from .poke_cube import PokeCubeEnv
from .lift_peg_upright import LiftPegUprightEnv
from .roll_ball import RollBallEnv
from .place_sphere import PlaceSphereEnv
