from .humanoid_stand import HumanoidStandEnv, UnitreeH1StandEnv, UnitreeG1StandEnv
