"""Sim configuration dataclasses (counterpart of
mani_skill/utils/structs/types.py:12-95)."""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import numpy as np

Array = object  # typing alias for jax arrays / array-likes


@dataclasses.dataclass
class SceneConfig:
    gravity: Tuple[float, float, float] = (0.0, 0.0, -9.81)
    solver_position_iterations: int = 16  # maps to impulse-solver iterations
    # (APGD: ~2x the convergence of plain PGD per iteration, so 16 here
    # matches the old 32-iteration PGD default and the reference's 15
    # position iterations, mani_skill/utils/structs/types.py:37-95)
    solver_velocity_iterations: int = 1
    contact_slop: float = 0.002
    baumgarte: float = 0.2
    # contacts within this separation keep live solver rows (speculative
    # contacts; the PhysX contact_offset analog). Persistent rows keep the
    # warm start across micro-separations — critical for grasp stability.
    contact_offset: float = 0.01
    # minimum approach speed for restitution to apply (PhysX
    # bounceThresholdVelocity; sapien SceneConfig default 2.0)
    bounce_threshold: float = 2.0


@dataclasses.dataclass
class DefaultMaterialsConfig:
    static_friction: float = 0.3
    dynamic_friction: float = 0.3
    restitution: float = 0.0


@dataclasses.dataclass
class GPUMemoryConfig:
    """Accepted for API compatibility (the reference pre-sizes PhysX GPU
    buffers, structs/types.py:12-34). On TPU all shapes are static at compile
    time, so these are advisory caps only."""

    temp_buffer_capacity: int = 2**24
    max_rigid_contact_count: int = 2**19
    max_rigid_patch_count: int = 2**18
    heap_capacity: int = 2**26
    found_lost_pairs_capacity: int = 2**25
    collision_stack_size: int = 2**26


@dataclasses.dataclass
class SimConfig:
    spacing: float = 5.0  # unused on TPU (no spatial sub-scene offsets needed)
    sim_freq: int = 100
    control_freq: int = 20
    gpu_memory_config: GPUMemoryConfig = dataclasses.field(default_factory=GPUMemoryConfig)
    scene_config: SceneConfig = dataclasses.field(default_factory=SceneConfig)
    default_materials_config: DefaultMaterialsConfig = dataclasses.field(
        default_factory=DefaultMaterialsConfig
    )

    @property
    def sim_steps_per_control(self) -> int:
        return self.sim_freq // self.control_freq


def merge_sim_config(base: SimConfig, override) -> SimConfig:
    """Merge a dict/SimConfig override into a base config (the reference uses
    dacite.from_dict, sapien_env.py:261-265)."""
    if override is None:
        return base
    if isinstance(override, SimConfig):
        return override
    out = dataclasses.replace(base)
    for k, v in override.items():
        cur = getattr(out, k, None)
        if dataclasses.is_dataclass(cur) and isinstance(v, dict):
            setattr(out, k, dataclasses.replace(cur, **v))
        else:
            setattr(out, k, v)
    return out
