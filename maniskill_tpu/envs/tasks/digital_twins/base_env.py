"""Digital-twin base environment with greenscreen compositing.

Counterpart of mani_skill/envs/tasks/digital_twins/base_env.py:16-180
(SIMPLER-style real2sim evaluation). The reference composites a real
"inpainting" photograph over every pixel whose segmentation id is NOT in a
keep-set (robot + manipulated objects), so the policy sees sim foreground on
real background.

TPU-native realization: the keep-set becomes a boolean lookup table over
segmentation ids (static per reconfigure), and the composite is a pure
`jnp.where` fused into the jitted observation program — no host round-trip,
no per-pixel Python. Overlay images load from disk when the real dataset is
present; otherwise a deterministic procedural stand-in image is synthesized
so the greenscreen path is always exercisable.
"""
from __future__ import annotations

import os
from typing import Dict, List, Optional, Union

import numpy as np
import jax.numpy as jnp

from ...base_env import BaseEnv
from ....structs.actor import Actor
from ....structs.articulation import Articulation
from ....structs.link import Link


def procedural_overlay_image(width: int, height: int, seed: int = 7) -> np.ndarray:
    """Deterministic synthetic 'real background' (uint8 HxWx3).

    Stand-in for the reference's real_inpainting photographs
    (ASSET_DIR/tasks/bridge_v2_real2sim_dataset/real_inpainting/*.png) when
    the dataset is not downloaded: smooth wall/table gradients with soft
    blob shadows, visually distinct from any simulated texture.
    """
    rng = np.random.RandomState(seed)
    y = np.linspace(0.0, 1.0, height)[:, None]
    x = np.linspace(0.0, 1.0, width)[None, :]
    # warm wall fading into a cooler tabletop
    wall = np.stack(
        [0.62 + 0.1 * y, 0.55 + 0.08 * y, 0.48 + 0.05 * y], axis=-1
    )
    table = np.stack(
        [0.45 + 0.05 * x, 0.38 + 0.04 * x, 0.32 + 0.03 * x], axis=-1
    )
    t = 1.0 / (1.0 + np.exp(-(y - 0.55) * 18.0))[..., None]
    img = wall * (1 - t) + table * t
    # a few soft blobs (furniture/shadow stand-ins)
    for _ in range(6):
        cy, cx = rng.uniform(0, 1, 2)
        r = rng.uniform(0.05, 0.2)
        tint = rng.uniform(-0.12, 0.12, 3)
        d2 = (y - cy) ** 2 + (x - cx) ** 2
        img = img + np.exp(-d2 / (2 * r * r))[..., None] * tint[None, None]
    img = img + rng.normal(0, 0.01, img.shape)  # sensor-noise texture
    return (np.clip(img, 0, 1) * 255).astype(np.uint8)


def load_overlay_image(path: str, width: int, height: int) -> np.ndarray:
    """Load + bilinear-resize an overlay PNG/JPG to (height, width, 3) uint8."""
    from PIL import Image

    img = Image.open(path).convert("RGB").resize((width, height), Image.BILINEAR)
    return np.asarray(img, np.uint8)


class BaseDigitalTwinEnv(BaseEnv):
    """Base class for real2sim/sim2real digital-twin evaluation envs.

    Subclasses set ``rgb_overlay_paths`` (camera name -> image path; missing
    files fall back to :func:`procedural_overlay_image`) and call
    :meth:`remove_object_from_greenscreen` for each foreground object in
    ``_load_scene``.
    """

    rgb_overlay_paths: Optional[Dict[str, str]] = None
    rgb_overlay_mode: str = "background"  # "background" | "debug" | "none"

    def __init__(self, **kwargs):
        self._greenscreen_keep: List[Union[Actor, Link]] = []
        self._keep_lut: Optional[jnp.ndarray] = None
        self._rgb_overlay_images: Dict[str, jnp.ndarray] = {}
        super().__init__(**kwargs)

    def remove_object_from_greenscreen(self, obj):
        """Keep obj rendered in sim (exclude it from the overlay)."""
        if isinstance(obj, Articulation):
            self._greenscreen_keep.extend(obj.links)
        else:
            self._greenscreen_keep.append(obj)

    def _after_reconfigure(self, options: dict):
        super()._after_reconfigure(options)
        if self.rgb_overlay_mode == "none" or not self.rgb_overlay_paths:
            return
        # robot links always stay in the foreground
        for ag in self.agent.agents if hasattr(self.agent, "agents") else [self.agent]:
            self.remove_object_from_greenscreen(ag.robot)
        keep_ids = sorted(
            {int(o.per_scene_id) for o in self._greenscreen_keep
             if o.per_scene_id is not None}
        )
        n = int(self.scene._next_seg_id) + 1
        lut = np.zeros(n, bool)
        lut[np.asarray(keep_ids, np.int64)] = True
        self._keep_lut = jnp.asarray(lut)
        self._greenscreen_keep = []

        for cam_name, path in self.rgb_overlay_paths.items():
            cfg = self._sensor_configs[cam_name]
            if path is not None and os.path.exists(path):
                img = load_overlay_image(path, cfg.width, cfg.height)
            else:
                img = procedural_overlay_image(cfg.width, cfg.height)
            self._rgb_overlay_images[cam_name] = jnp.asarray(img)

    def _green_screen_rgb(self, rgb, segmentation, overlay_img):
        """Composite: sim foreground where seg id is kept, overlay elsewhere.

        rgb (B, H, W, 3) uint8; segmentation (B, H, W, 1) int16;
        overlay_img (H, W, 3) uint8. Pure jnp — fuses into the obs program.
        """
        seg = jnp.clip(segmentation[..., 0].astype(jnp.int32), 0,
                       self._keep_lut.shape[0] - 1)
        keep = self._keep_lut[seg][..., None]  # (B, H, W, 1) bool
        if self.rgb_overlay_mode == "debug":
            return (rgb.astype(jnp.float32) * 0.5
                    + overlay_img[None].astype(jnp.float32) * 0.5
                    ).astype(jnp.uint8)
        return jnp.where(keep, rgb, overlay_img[None])

    def _get_obs_with_sensor_data(self, info: dict, apply_texture_transforms=True):
        obs = super()._get_obs_with_sensor_data(info, apply_texture_transforms)
        if (
            self.rgb_overlay_mode == "none"
            or not self._rgb_overlay_images
            or self._keep_lut is None
        ):
            return obs
        for cam_name, overlay in self._rgb_overlay_images.items():
            cam = obs["sensor_data"].get(cam_name)
            if cam is None or "rgb" not in cam or "segmentation" not in cam:
                continue
            cam["rgb"] = self._green_screen_rgb(
                cam["rgb"], cam["segmentation"], overlay
            )
        return obs
