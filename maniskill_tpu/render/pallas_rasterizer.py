"""Pallas TPU tiled rasterizer with scanline binning.

The jnp rasterizer tests every face against every pixel (B*F*H*W work); this
kernel first bins faces into pixel-row bands (XLA sort/gather, <1ms) and then
each grid cell (env, band) streams only its overlapping faces through the
VPU from SMEM — the software analog of the GPU's hardware binned rasterizer
that the reference relies on (render camera groups, SURVEY.md §2.1).

Per-face math is reduced to affine evaluations: the vertex stage precomputes
edge coefficients (sign-premultiplied, validity-folded) and an affine 1/z
plane, so the inner loop is 4 planes x (a*px + b*py + c) + compares — no
divides (depth compares happen in 1/z space; the single reciprocal per pixel
is done by the caller on the final buffer).

Memory layout (driven by Mosaic's tiling rules — VMEM scalar loads must be
lane-aligned, SMEM 1D blocks carry XLA's T(1024) tiling): one flat record
array, 16 floats per face [e01.a,b,c, e12.a,b,c, e20.a,b,c, z.a,b,c,
face_id, pad x3], a 16-float header carrying the face count, 255 face slots
per (env, band) = 4096-float SMEM blocks. Overflowing faces are dropped.

Outputs: inv-depth + face-id tiles; color/segmentation/depth are cheap
gathers/elementwise done outside.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE_H = 16
LANES = 128
SLOTS = 256  # 1 header + 255 face records (16 floats each) = 4096 floats
REC = 16


def _raster_kernel(c_ref, iz_out, f_out, *, width, n_bands):
    bt = pl.program_id(0)
    band = jax.lax.rem(bt, n_bands)
    row0 = band * TILE_H

    # tpu.iota only supports integer vectors; cast after
    py = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, width), 0).astype(jnp.float32)
        + row0.astype(jnp.float32)
        + 0.5
    )
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, width), 1).astype(jnp.float32)
        + 0.5
    )

    n = c_ref[0].astype(jnp.int32)

    def face_body(j, carry):
        izbuf, fbuf = carry
        o = REC * (j + 1)
        # dynamic scalar reads are legal from SMEM
        e01 = c_ref[o + 0] * px + c_ref[o + 1] * py + c_ref[o + 2]
        e12 = c_ref[o + 3] * px + c_ref[o + 4] * py + c_ref[o + 5]
        e20 = c_ref[o + 6] * px + c_ref[o + 7] * py + c_ref[o + 8]
        inv_z = c_ref[o + 9] * px + c_ref[o + 10] * py + c_ref[o + 11]
        fid = c_ref[o + 12].astype(jnp.int32)

        inside = (e01 >= 0) & (e12 >= 0) & (e20 >= 0)
        better = inside & (inv_z > izbuf)  # larger 1/z = closer
        izbuf = jnp.where(better, inv_z, izbuf)
        fbuf = jnp.where(better, fid, fbuf)
        return izbuf, fbuf

    izbuf0 = jnp.zeros((TILE_H, width), jnp.float32)
    fbuf0 = jnp.full((TILE_H, width), -1, jnp.int32)
    izbuf, fbuf = jax.lax.fori_loop(0, n, face_body, (izbuf0, fbuf0))
    iz_out[:] = izbuf
    f_out[:] = fbuf


@functools.partial(jax.jit, static_argnames=("height", "width"))
def pallas_rasterize_tiles(
    fx: jax.Array,  # (B, F, 3) screen x per corner
    fy: jax.Array,  # (B, F, 3)
    finv_z: jax.Array,  # (B, F, 3) 1/z per corner
    ok: jax.Array,  # (B, F) validity
    height: int,
    width: int,
) -> Tuple[jax.Array, jax.Array]:
    B, F, _ = fx.shape
    assert height % TILE_H == 0, height
    T = height // TILE_H
    K = SLOTS - 1  # face slots per band

    # --- vertex stage: per-face affine coefficients -------------------------
    x0, x1, x2 = fx[..., 0], fx[..., 1], fx[..., 2]
    y0, y1, y2 = fy[..., 0], fy[..., 1], fy[..., 2]
    area = (x1 - x0) * (y2 - y0) - (y1 - y0) * (x2 - x0)
    s = jnp.sign(jnp.where(jnp.abs(area) < 1e-9, 1e-9, area))
    degenerate = jnp.abs(area) < 1e-9
    valid = (ok > 0) & ~degenerate

    def edge(xa, ya, xb, yb):
        # e(p) = (xb-xa)*(py-ya) - (yb-ya)*(px-xa), premultiplied by s;
        # invalid faces get a = b = 0, c = -1 so they never pass
        a = -s * (yb - ya)
        b = s * (xb - xa)
        c = s * ((yb - ya) * xa - (xb - xa) * ya)
        a = jnp.where(valid, a, 0.0)
        b = jnp.where(valid, b, 0.0)
        c = jnp.where(valid, c, -1.0)
        return a, b, c

    e01 = edge(x0, y0, x1, y1)
    e12 = edge(x1, y1, x2, y2)
    e20 = edge(x2, y2, x0, y0)
    # affine 1/z: inv_z(p) = (e12(p)*iz0 + e20(p)*iz1 + e01(p)*iz2) / area
    # (each raw edge function is affine; combine coefficient-wise)
    inv_area = 1.0 / jnp.where(jnp.abs(area) < 1e-9, 1e-9, area)
    iz0, iz1, iz2 = finv_z[..., 0], finv_z[..., 1], finv_z[..., 2]

    def zc(k):
        # raw (unsigned) edge coefficients = signed ones * s
        return (
            (e12[k] * iz0 + e20[k] * iz1 + e01[k] * iz2) * s * inv_area
        )

    z_a, z_b, z_c = zc(0), zc(1), zc(2)

    # --- binning: which faces overlap each band? ----------------------------
    ymin = jnp.min(fy, axis=-1)
    ymax = jnp.max(fy, axis=-1)
    xmin = jnp.min(fx, axis=-1)
    xmax = jnp.max(fx, axis=-1)
    on_screen = valid & (xmax >= 0) & (xmin < width) & (ymax >= 0) & (ymin < height)
    bands = jnp.arange(T, dtype=jnp.float32)[None, :, None] * TILE_H  # (1, T, 1)
    overlap = (
        on_screen[:, None, :]
        & (ymax[:, None, :] >= bands)
        & (ymin[:, None, :] < bands + TILE_H)
    )  # (B, T, F)

    order = jnp.argsort(~overlap, axis=-1, stable=True)[..., :K]  # (B, T, K)
    counts = jnp.minimum(jnp.sum(overlap, axis=-1), K)
    sel_ok = jnp.take_along_axis(overlap, order, axis=-1)

    # pack records (B, F, 16) then gather per band
    rec = jnp.stack(
        [
            e01[0], e01[1], e01[2],
            e12[0], e12[1], e12[2],
            e20[0], e20[1], e20[2],
            z_a, z_b, z_c,
            jnp.zeros_like(z_a),  # fid written after gather (needs order)
            jnp.zeros_like(z_a),
            jnp.zeros_like(z_a),
            jnp.zeros_like(z_a),
        ],
        axis=-1,
    )  # (B, F, 16)
    g = jnp.take_along_axis(rec[:, None], order[..., None], axis=2)  # (B,T,K,16)
    g = g.at[..., 12].set(order.astype(jnp.float32))
    # drop faces that were gathered but don't overlap (padding slots)
    g = g.at[..., 11].set(jnp.where(sel_ok, g[..., 11], 0.0))
    g = g.at[..., 2].set(jnp.where(sel_ok, g[..., 2], -1.0))
    g = g.at[..., 0].set(jnp.where(sel_ok, g[..., 0], 0.0))
    g = g.at[..., 1].set(jnp.where(sel_ok, g[..., 1], 0.0))

    header = (
        jnp.zeros((B, T, 1, REC), jnp.float32)
        .at[..., 0, 0]
        .set(counts.astype(jnp.float32))
    )
    flat = jnp.concatenate([header, g], axis=2).reshape(-1)

    # --- kernel --------------------------------------------------------------
    grid = (B * T,)
    rec_spec = pl.BlockSpec((SLOTS * REC,), lambda i: (i,), memory_space=pltpu.SMEM)
    out_spec = pl.BlockSpec((1, TILE_H, width), lambda i: (i, 0, 0))

    def kernel(c_ref, iz_out, f_out):
        _raster_kernel(c_ref, iz_out.at[0], f_out.at[0], width=width, n_bands=T)

    izbuf, fbuf = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[rec_spec],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B * T, TILE_H, width), jnp.float32),
            jax.ShapeDtypeStruct((B * T, TILE_H, width), jnp.int32),
        ],
    )(flat)
    izbuf = izbuf.reshape(B, height, width)
    fbuf = fbuf.reshape(B, height, width)
    zbuf = jnp.where(fbuf >= 0, 1.0 / jnp.maximum(izbuf, 1e-9), 1e9)
    return zbuf, fbuf


def pallas_available(height: int, width: int) -> bool:
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    return height % TILE_H == 0 and width % LANES == 0
