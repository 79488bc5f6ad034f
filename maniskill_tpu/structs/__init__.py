from .pose import Pose
from .actor import Actor
from .link import Link
from .articulation import Articulation, ArticulationJoint
from .types import SimConfig, SceneConfig, GPUMemoryConfig, DefaultMaterialsConfig

__all__ = [
    "Pose", "Actor", "Link", "Articulation", "ArticulationJoint",
    "SimConfig", "SceneConfig", "GPUMemoryConfig", "DefaultMaterialsConfig",
]
