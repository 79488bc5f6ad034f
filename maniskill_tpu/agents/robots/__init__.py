from .panda.panda import Panda
from .so100.so100 import SO100
from .dclaw.dclaw import DClaw
