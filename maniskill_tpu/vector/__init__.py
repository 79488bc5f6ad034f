from .gymnasium import ManiSkillVectorEnv
