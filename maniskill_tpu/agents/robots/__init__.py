from .panda.panda import Panda
