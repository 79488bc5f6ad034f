from .. import agents  # registers robots
from ..agents import robots  # noqa: F401
from .base_env import BaseEnv
from . import tasks  # registers all task envs
