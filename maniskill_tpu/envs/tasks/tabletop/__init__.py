from .push_cube import PushCubeEnv
from .pick_cube import PickCubeEnv, PickCubeSO100Env, PickCubeWidowXAIEnv
from .pull_cube import PullCubeEnv
from .stack_cube import StackCubeEnv
from .poke_cube import PokeCubeEnv
from .lift_peg_upright import LiftPegUprightEnv
from .roll_ball import RollBallEnv
from .place_sphere import PlaceSphereEnv
from .two_robot_pick_cube import TwoRobotPickCubeEnv
from .push_t import PushTEnv
from .peg_insertion_side import PegInsertionSideEnv
from .turn_faucet import TurnFaucetEnv
from .plug_charger import PlugChargerEnv
from .two_robot_stack_cube import TwoRobotStackCubeEnv
from .pick_single_ycb import PickSingleYCBEnv
from .pull_cube_tool import PullCubeToolEnv
from .stack_pyramid import StackPyramidEnv
