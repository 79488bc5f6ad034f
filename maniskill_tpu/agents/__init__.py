from .base_agent import BaseAgent, Keyframe, MultiAgent
from .registration import register_agent, REGISTERED_AGENTS
