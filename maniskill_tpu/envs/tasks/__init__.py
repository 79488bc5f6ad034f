from . import tabletop
from . import control
from . import benchmark
from . import mobile_manipulation
from . import dexterity
