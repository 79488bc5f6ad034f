"""StereoDepthCamera (counterpart of mani_skill/sensors/depth_camera.py:19-148).

The reference simulates active-stereo depth via a second IR camera pair and a
matching shader. Here stereo depth is approximated physically: depth is
rendered from two horizontally offset viewpoints; pixels whose disparity
disagrees (occluded in one eye) are invalidated, and depth is quantized to
the disparity resolution — reproducing the characteristic stereo artifacts
(occlusion shadows, quantization bands) without a full IR pipeline.
"""
from __future__ import annotations

import dataclasses
from typing import Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .camera import Camera, CameraConfig


@dataclasses.dataclass
class StereoDepthCameraConfig(CameraConfig):
    baseline: float = 0.055  # RealSense D435-like
    disparity_bits: int = 8

    @property
    def uuid(self):
        return self.uid


class StereoDepthCamera(Camera):
    def __init__(self, config: StereoDepthCameraConfig, scene):
        super().__init__(config, scene)
        self.baseline = getattr(config, "baseline", 0.055)
        self.disparity_levels = 2 ** getattr(config, "disparity_bits", 8)

    def get_obs(self, rgb=True, depth=True, segmentation=False, position=False,
                normal=False, apply_texture_transforms=True, hidden_actors=()):
        out = super().get_obs(
            rgb=rgb, depth=False, segmentation=segmentation,
            position=position, normal=normal,
            apply_texture_transforms=apply_texture_transforms,
            hidden_actors=hidden_actors,
        )
        if not depth:
            return out

        # left eye = main camera; right eye offset along camera -y (ROS frame)
        mesh, buf_l = self.capture(hidden_actors)
        view = self._view_matrix()
        offset = jnp.zeros_like(view).at[:, 0, 3].add(-self.baseline)
        from ..render.rasterizer import rasterize

        gpos_gquat = None
        from ..physics.kinematics import geom_poses

        gpos, gquat = geom_poses(self.scene.model, self.scene.data)
        wv = mesh.world_vertices(gpos, gquat)
        buf_r = rasterize(
            mesh, wv, view + offset, self.proj,
            self.config.height, self.config.width, lights=self.scene.lights,
        )

        z_l = buf_l["depth"]
        z_r = buf_r["depth"]
        fx = self.fx
        # disparity consistency: project right-eye depth back; mismatched
        # pixels (occlusions) are invalid, like real stereo shadows
        disp_l = jnp.where(z_l > 0, fx * self.baseline / jnp.maximum(z_l, 1e-4), 0.0)
        disp_r = jnp.where(z_r > 0, fx * self.baseline / jnp.maximum(z_r, 1e-4), 0.0)
        valid = jnp.abs(disp_l - disp_r) < 2.0
        # quantize to disparity resolution
        max_disp = fx * self.baseline / 0.05
        disp_q = jnp.round(disp_l / max_disp * self.disparity_levels) * (
            max_disp / self.disparity_levels
        )
        z_q = jnp.where(
            (disp_q > 0) & valid, fx * self.baseline / jnp.maximum(disp_q, 1e-6), 0.0
        )
        out["depth"] = jnp.clip(z_q * 1000.0, 0, 32767).astype(jnp.int16)[..., None]
        return out
