from . import actors
from .actor_builder import ActorBuilder
from .articulation_builder import ArticulationBuilder, LinkSpec, ShapeSpec
from .ground import build_ground
