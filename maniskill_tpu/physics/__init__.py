"""TPU-native batched rigid-body physics engine.

Replaces the reference's SAPIEN/PhysX native layer (SURVEY.md §2.1) with a
pure-JAX reduced-coordinate engine: ``Model`` (static scene tables) +
``Data`` (batched state pytree) + ``step`` (jit/shard-ready pure function).
"""
from .types import (
    BOX,
    CAPSULE,
    CYLINDER,
    DYNAMIC,
    FIXED,
    FREE,
    HINGE,
    KINEMATIC,
    PLANE,
    SLIDE,
    SPHERE,
    STATIC,
    Contact,
    Data,
    Model,
    default_qpos,
    make_data,
)
from .builder import ModelBuilder
from .step import forward, step
from .kinematics import forward_kinematics, geom_poses

__all__ = [
    "BOX", "CAPSULE", "CYLINDER", "DYNAMIC", "FIXED", "FREE", "HINGE",
    "KINEMATIC", "PLANE", "SLIDE", "SPHERE", "STATIC",
    "Contact", "Data", "Model", "ModelBuilder",
    "default_qpos", "make_data", "forward", "step",
    "forward_kinematics", "geom_poses",
]
