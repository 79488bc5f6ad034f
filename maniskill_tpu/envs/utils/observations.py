"""Obs-mode parsing + pointcloud conversion.

Counterpart of mani_skill/envs/utils/observations/ (__init__.py:37,
observations.py:16-67). Obs modes compose with '+' (e.g.
"rgb+depth+segmentation"); "rgbd" is an alias for "rgb+depth".
"""
from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

MODALITIES = ("rgb", "depth", "segmentation", "position", "normal", "albedo")


def parse_obs_mode_to_struct(obs_mode: str) -> Dict[str, bool]:
    struct = {m: False for m in MODALITIES}
    struct["state"] = False
    struct["state_dict"] = False
    if obs_mode in ("state", "state_dict", "none"):
        struct[obs_mode if obs_mode != "none" else "state"] = obs_mode != "none"
        struct["use_state"] = obs_mode in ("state", "state_dict")
        return struct
    if obs_mode == "rgbd":
        obs_mode = "rgb+depth"
    if obs_mode == "pointcloud":
        struct["position"] = True
        struct["rgb"] = True
        struct["segmentation"] = True
        struct["use_state"] = False
        return struct
    for part in obs_mode.split("+"):
        part = part.strip()
        if part == "state":
            struct["state"] = True
        elif part in MODALITIES:
            struct[part] = True
        else:
            raise ValueError(f"unknown obs modality {part!r} in {obs_mode!r}")
    struct["use_state"] = struct["state"]
    return struct


def sensor_data_to_pointcloud(obs: dict, sensors: dict) -> dict:
    """Merge per-camera position maps into one world-frame pointcloud
    (observations.py:16-67 parity: mm->m, cam2world transform, concat)."""
    sensor_data = obs.pop("sensor_data")
    params = obs.pop("sensor_param")
    pcds = {"xyzw": [], "rgb": [], "segmentation": []}
    for name, data in sensor_data.items():
        pos = data["position"].astype(jnp.float32) / 1000.0  # mm -> m
        B, H, W, _ = pos.shape
        # valid points: position map w-channel marks background as 0
        valid = data.get("position_valid")
        if valid is None:
            valid = jnp.ones((B, H, W), bool)
        c2w = params[name]["cam2world_gl"]  # (B, 4, 4)
        p = pos.reshape(B, -1, 3)
        pw = jnp.einsum("bij,bnj->bni", c2w[:, :3, :3], p) + c2w[:, None, :3, 3]
        w = valid.reshape(B, -1, 1).astype(jnp.float32)
        pcds["xyzw"].append(jnp.concatenate([pw, w], axis=-1))
        if "rgb" in data:
            pcds["rgb"].append(data["rgb"].reshape(B, -1, 3))
        if "segmentation" in data:
            pcds["segmentation"].append(data["segmentation"].reshape(B, -1, 1))
    pointcloud = {k: jnp.concatenate(v, axis=1) for k, v in pcds.items() if v}
    obs["pointcloud"] = pointcloud
    return obs
