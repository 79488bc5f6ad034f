"""Pallas TPU tiled rasterizer.

The jnp rasterizer materializes (B, chunk, H, W) coverage intermediates in
HBM; this kernel keeps the z-buffer and face loop entirely in VMEM — each
grid cell owns one (TILE_H, W) pixel tile of one env and streams all faces
through the VPU, so HBM traffic is just the per-env face table (KBs) plus one
write of the output tile. This is the "hot op as a Pallas kernel" for camera
throughput (reference headline: 30k+ FPS RGBD, README.md:14).

Grid: (B, H // TILE_H). Inputs are per-env face tables precomputed by the
vertex stage (screen xy, camera-space z per corner, validity). Outputs are
depth + face-id tiles; color/segmentation are cheap gathers done outside.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 8
LANES = 128
BIG = 1e9


def _raster_kernel(fx_ref, fy_ref, fz_ref, ok_ref, z_out, f_out, *, n_faces, width):
    ty = pl.program_id(1)
    row0 = ty * TILE_H

    py = (
        jax.lax.broadcasted_iota(jnp.float32, (TILE_H, width), 0)
        + jnp.float32(row0)
        + 0.5
    )
    px = jax.lax.broadcasted_iota(jnp.float32, (TILE_H, width), 1) + 0.5

    def face_body(i, carry):
        zbuf, fbuf = carry
        x0 = fx_ref[i, 0]
        x1 = fx_ref[i, 1]
        x2 = fx_ref[i, 2]
        y0 = fy_ref[i, 0]
        y1 = fy_ref[i, 1]
        y2 = fy_ref[i, 2]
        iz0 = fz_ref[i, 0]
        iz1 = fz_ref[i, 1]
        iz2 = fz_ref[i, 2]
        valid = ok_ref[i] > 0

        e01 = (x1 - x0) * (py - y0) - (y1 - y0) * (px - x0)
        e12 = (x2 - x1) * (py - y1) - (y2 - y1) * (px - x1)
        e20 = (x0 - x2) * (py - y2) - (y0 - y2) * (px - x2)
        area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
        area_safe = jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
        s = jnp.sign(area_safe)
        inside = (e01 * s >= 0) & (e12 * s >= 0) & (e20 * s >= 0)
        inside = inside & valid & (jnp.abs(area) > 1e-9)

        # perspective-correct depth via barycentric interpolation of 1/z
        inv_area = 1.0 / area_safe
        b0 = e12 * inv_area
        b1 = e20 * inv_area
        b2 = e01 * inv_area
        inv_z = b0 * iz0 + b1 * iz1 + b2 * iz2
        z = 1.0 / jnp.maximum(inv_z, 1e-9)

        better = inside & (z < zbuf)
        zbuf = jnp.where(better, z, zbuf)
        fbuf = jnp.where(better, jnp.int32(i), fbuf)
        return zbuf, fbuf

    zbuf0 = jnp.full((TILE_H, width), BIG, jnp.float32)
    fbuf0 = jnp.full((TILE_H, width), -1, jnp.int32)
    zbuf, fbuf = jax.lax.fori_loop(0, n_faces, face_body, (zbuf0, fbuf0))
    z_out[:] = zbuf
    f_out[:] = fbuf


@functools.partial(jax.jit, static_argnames=("height", "width"))
def pallas_rasterize_tiles(
    fx: jax.Array,  # (B, F, 3) screen x per corner
    fy: jax.Array,  # (B, F, 3)
    finv_z: jax.Array,  # (B, F, 3) 1/z per corner
    ok: jax.Array,  # (B, F) int32 validity
    height: int,
    width: int,
) -> Tuple[jax.Array, jax.Array]:
    B, F, _ = fx.shape
    assert height % TILE_H == 0, height
    grid = (B, height // TILE_H)

    face_spec = pl.BlockSpec(
        (1, F, 3), lambda b, t: (b, 0, 0), memory_space=pltpu.ANY
    )
    # faces fit VMEM comfortably (F*3*4B); let the compiler place them
    face_spec = pl.BlockSpec((1, F, 3), lambda b, t: (b, 0, 0))
    ok_spec = pl.BlockSpec((1, F), lambda b, t: (b, 0))
    out_spec = pl.BlockSpec((1, TILE_H, width), lambda b, t: (b, t, 0))

    def kernel(fx_ref, fy_ref, fz_ref, ok_ref, z_out, f_out):
        _raster_kernel(
            fx_ref.at[0], fy_ref.at[0], fz_ref.at[0], ok_ref.at[0],
            z_out.at[0], f_out.at[0], n_faces=F, width=width,
        )

    zbuf, fbuf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[face_spec, face_spec, face_spec, ok_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, height, width), jnp.float32),
            jax.ShapeDtypeStruct((B, height, width), jnp.int32),
        ],
    )(fx, fy, finv_z, ok)
    return zbuf, fbuf


def pallas_available(height: int, width: int) -> bool:
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    return height % TILE_H == 0 and width % LANES == 0
