from . import tabletop
from . import control
