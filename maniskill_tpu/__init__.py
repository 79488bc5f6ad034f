"""maniskill_tpu: TPU-native robot simulation + learning framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ManiSkill 3 (reference: haosulab/ManiSkill): batched rigid-body physics,
robot agents with PD/IK controllers, camera sensors with a batched
rasterizer, a Gymnasium task library, and trajectory tooling — all compiled
into single XLA programs that shard over TPU meshes on the env axis.
"""
__version__ = "0.1.0"

import os

# in-package assets (compact URDFs etc.; counterpart of the reference's
# PACKAGE_ASSET_DIR, mani_skill/__init__.py)
PACKAGE_DIR = os.path.dirname(__file__)
PACKAGE_ASSET_DIR = os.path.join(PACKAGE_DIR, "assets")

from .utils.registration import register_env, make, REGISTERED_ENVS

__all__ = [
    "register_env", "make", "REGISTERED_ENVS", "__version__",
    "PACKAGE_DIR", "PACKAGE_ASSET_DIR",
]
