"""Baked texturing for the TPU rasterizer.

The reference renders UV-textured PBR meshes through Vulkan samplers
(mani_skill/render/shaders.py:89-105 texture contract). Per-pixel texture
fetches are gather-shaped and hostile to the TPU memory system, so textures
are *baked to geometry* at load time instead: a textured surface becomes a
tessellated mesh whose per-FACE colors sample the texture at each face
centroid. At 128-512 px camera resolutions a face that projects to a few
pixels is indistinguishable from a texel — and the rasterizer kernel stays
the flat-shaded fast path (no per-pixel UV interpolation, no gathers).

Provides procedural texture images (checker / wood / speckle), UV-OBJ + MTL
loading for real textured assets (YCB ``textured.obj``), and the
bake-to-face-colors helpers.
"""
from __future__ import annotations

import os
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# procedural texture images (T, T, 3) float32 in [0, 1]
# ---------------------------------------------------------------------------
def checker(size: int = 64, tiles: int = 8,
            c1=(0.82, 0.80, 0.76), c2=(0.35, 0.33, 0.30)) -> np.ndarray:
    y, x = np.mgrid[0:size, 0:size]
    m = ((x * tiles // size) + (y * tiles // size)) % 2
    img = np.where(m[..., None] == 0, np.asarray(c1, np.float32),
                   np.asarray(c2, np.float32))
    return img.astype(np.float32)


def wood(size: int = 64, base=(0.585, 0.437, 0.296), seed: int = 0) -> np.ndarray:
    """Plank-style wood grain: long-wavelength rings + fine streaks."""
    rng = np.random.RandomState(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32) / size
    rings = 0.5 + 0.5 * np.sin(2 * np.pi * (6.0 * y + 1.5 * np.sin(2 * np.pi * x)))
    streak = np.zeros((size, size), np.float32)
    for f, a in ((23, 0.4), (47, 0.25), (89, 0.15)):
        ph = rng.uniform(0, 2 * np.pi)
        streak += a * np.sin(2 * np.pi * f * y + ph + 3.0 * x)
    tone = 0.82 + 0.18 * rings + 0.08 * streak
    img = np.asarray(base, np.float32)[None, None] * tone[..., None]
    return np.clip(img, 0.0, 1.0).astype(np.float32)


def speckle(size: int = 64, base=(0.5, 0.5, 0.5), amp: float = 0.12,
            seed: int = 0) -> np.ndarray:
    rng = np.random.RandomState(seed)
    n = rng.uniform(-1.0, 1.0, (size // 4, size // 4, 1)).astype(np.float32)
    n = np.kron(n, np.ones((4, 4, 1), np.float32))  # blocky speckle
    img = np.asarray(base, np.float32)[None, None] * (1.0 + amp * n)
    return np.clip(img, 0.0, 1.0).astype(np.float32)


# ---------------------------------------------------------------------------
# sampling / baking
# ---------------------------------------------------------------------------
def sample_bilinear(image: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Bilinear sample image (H, W, 3) at uv (..., 2) in [0,1] (wrapping)."""
    H, W = image.shape[:2]
    u = np.mod(uv[..., 0], 1.0) * (W - 1)
    # v up -> row down: v=0 samples the BOTTOM row (H-1), v=1 the top (OBJ/GL
    # convention). No outer mod — that would alias both v=0 and v=1 to row 0.
    v = (1.0 - np.mod(uv[..., 1], 1.0)) * (H - 1)
    x0 = np.floor(u).astype(np.int64)
    y0 = np.floor(v).astype(np.int64)
    x1 = np.minimum(x0 + 1, W - 1)
    y1 = np.minimum(y0 + 1, H - 1)
    fx = (u - x0)[..., None]
    fy = (v - y0)[..., None]
    c = (
        image[y0, x0] * (1 - fx) * (1 - fy)
        + image[y0, x1] * fx * (1 - fy)
        + image[y1, x0] * (1 - fx) * fy
        + image[y1, x1] * fx * fy
    )
    return c.astype(np.float32)


def bake_face_colors(faces: np.ndarray, uv: np.ndarray, image: np.ndarray,
                     shade: float = 1.0) -> np.ndarray:
    """Per-face colors = texture sampled at each face's UV centroid."""
    fuv = uv[np.asarray(faces, np.int64)].mean(axis=1)  # (F, 2)
    return np.clip(sample_bilinear(image, fuv) * shade, 0.0, 1.0)


def textured_quad_grid(
    half_x: float,
    half_y: float,
    image: np.ndarray,
    res: int = 12,
    z: float = 0.0,
    uv_tiles: float = 1.0,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """A z-up quad tessellated res x res with baked per-face texture colors.

    Returns (verts (V,3), faces (F,3), face_colors (F,3)); F = 2*res^2.
    The bake-to-geometry realization of a textured plane (table tops,
    greenscreen floors): each grid cell is ~texel-sized at camera res.
    """
    xs = np.linspace(-half_x, half_x, res + 1, dtype=np.float32)
    ys = np.linspace(-half_y, half_y, res + 1, dtype=np.float32)
    gx, gy = np.meshgrid(xs, ys, indexing="ij")
    verts = np.stack([gx, gy, np.full_like(gx, z)], axis=-1).reshape(-1, 3)
    uv = np.stack(
        [
            (gx / (2 * half_x) + 0.5) * uv_tiles,
            (gy / (2 * half_y) + 0.5) * uv_tiles,
        ],
        axis=-1,
    ).reshape(-1, 2)
    idx = np.arange((res + 1) * (res + 1)).reshape(res + 1, res + 1)
    a = idx[:-1, :-1].ravel()
    b = idx[1:, :-1].ravel()
    c = idx[1:, 1:].ravel()
    d = idx[:-1, 1:].ravel()
    # ccw seen from +z
    faces = np.concatenate(
        [np.stack([a, b, c], 1), np.stack([a, c, d], 1)], axis=0
    ).astype(np.int32)
    face_colors = bake_face_colors(faces, uv, image)
    return verts, faces, face_colors


# ---------------------------------------------------------------------------
# real textured assets: OBJ with vt/f v/vt + MTL map_Kd
# ---------------------------------------------------------------------------
def load_obj_with_uv(path: str):
    """Parse an OBJ keeping UVs: returns (verts, faces, uv_per_corner (F,3,2),
    texture_image or None). Handles 'f v/vt' indices and the MTL map_Kd."""
    verts, vts, faces, fuv = [], [], [], []
    mtl_file = None
    base = Path(path).parent
    for line in Path(path).read_text(errors="ignore").splitlines():
        if line.startswith("v "):
            verts.append([float(x) for x in line.split()[1:4]])
        elif line.startswith("vt "):
            vals = line.split()[1:3]
            vts.append([float(vals[0]), float(vals[1])])
        elif line.startswith("mtllib "):
            mtl_file = line.split(None, 1)[1].strip()
        elif line.startswith("f "):
            parts = line.split()[1:]
            vi, ti = [], []
            for p in parts:
                comps = p.split("/")
                vi.append(int(comps[0]) - 1)
                ti.append(int(comps[1]) - 1 if len(comps) > 1 and comps[1] else -1)
            for k in range(1, len(vi) - 1):
                faces.append([vi[0], vi[k], vi[k + 1]])
                fuv.append([ti[0], ti[k], ti[k + 1]])
    verts = np.asarray(verts, np.float32)
    faces = np.asarray(faces, np.int32)
    vts = np.asarray(vts, np.float32) if vts else np.zeros((1, 2), np.float32)
    fuv = np.asarray(fuv, np.int64)
    uv_corner = vts[np.maximum(fuv, 0)]  # (F, 3, 2)

    image = None
    if mtl_file is not None and (base / mtl_file).exists():
        for line in (base / mtl_file).read_text(errors="ignore").splitlines():
            if line.strip().startswith("map_Kd"):
                tex = line.split(None, 1)[1].strip()
                tp = base / tex
                if tp.exists():
                    image = load_image(str(tp))
                break
    return verts, faces, uv_corner, image


def load_image(path: str) -> Optional[np.ndarray]:
    try:
        from PIL import Image

        img = Image.open(path).convert("RGB")
        return np.asarray(img, np.float32) / 255.0
    except Exception:
        return None


def bake_obj_face_colors(path: str, fallback=(0.7, 0.7, 0.7)):
    """Load a textured OBJ and bake per-face centroid-UV colors.

    Returns (verts, faces, face_colors). Used for YCB ``textured.obj`` when
    the real dataset is present; face colors fall back to a flat tone when
    the texture is missing."""
    verts, faces, uv_corner, image = load_obj_with_uv(path)
    if image is not None and len(faces):
        fuv = uv_corner.mean(axis=1)
        face_colors = sample_bilinear(image, fuv)
    else:
        face_colors = np.tile(np.asarray(fallback, np.float32), (len(faces), 1))
    return verts, faces, face_colors
