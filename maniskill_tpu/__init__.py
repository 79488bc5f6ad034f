"""maniskill_tpu: TPU-native robot simulation + learning framework.

A from-scratch JAX/XLA/Pallas implementation of the capabilities of
ManiSkill 3 (reference: haosulab/ManiSkill): batched rigid-body physics,
robot agents with PD/IK controllers, camera sensors with a batched
rasterizer, a Gymnasium task library, and trajectory tooling — all compiled
into single XLA programs that shard over TPU meshes on the env axis.
"""
__version__ = "0.1.0"

from .utils.registration import register_env, make, REGISTERED_ENVS

__all__ = ["register_env", "make", "REGISTERED_ENVS", "__version__"]
