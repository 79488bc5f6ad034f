from .pose import Pose
from .actor import Actor
from .link import Link
from .articulation import Articulation, ArticulationJoint
from .drive import Drive
from .types import SimConfig, SceneConfig, GPUMemoryConfig, DefaultMaterialsConfig

__all__ = [
    "Pose", "Actor", "Link", "Articulation", "ArticulationJoint", "Drive",
    "SimConfig", "SceneConfig", "GPUMemoryConfig", "DefaultMaterialsConfig",
]
