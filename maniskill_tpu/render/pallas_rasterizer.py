"""Pallas TPU tiled rasterizer with per-band face binning and in-kernel
flat shading.

The jnp rasterizer tests every face against every pixel (B*F*H*W work); this
kernel first bins faces into pixel-row bands (one bounded sort per band) and
each grid cell (env, band) streams only its overlapping faces — the software
analog of the GPU's hardware binned rasterizer the reference relies on
(render camera groups, SURVEY.md §2.1).

Per-face math is reduced to affine evaluations: the vertex stage precomputes
edge coefficients (sign-premultiplied, validity-folded) and an affine 1/z
plane, so the inner loop is 4 planes x (a*px + b*py + c) + compares — no
divides (depth compares happen in 1/z space).

Shading happens IN the kernel: each face record carries its pre-shaded flat
RGB and segmentation id, so the winning face writes color/seg directly into
the tile — there is no O(H*W*F) gather afterwards (the one-hot-matmul gather
this replaces dominated the old frame time).

Memory layout: the whole per-env face table (F_pad x 16 floats: [e01.a,b,c,
e12.a,b,c, e20.a,b,c, z.a,b,c, seg, r, g, b]) sits in SMEM and — because the
grid iterates bands innermost with a constant block index per env — is DMA'd
once per env, not once per band. Each band additionally gets a small index
list of its overlapping faces. Overflowing faces (> K per band) are dropped
AND counted; the count is returned so callers can warn instead of silently
truncating.
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
REC = 16
MAX_SMEM_FACES = 4096  # per-env face-table cap (4096*16*4B = 256 KB SMEM)


def _raster_kernel(n_ref, idx_ref, tab_ref, iz_out, f_out, r_out, g_out, b_out, *, width, n_bands):
    b = pl.program_id(0)
    t = pl.program_id(1)
    row0 = t * TILE_H
    n = n_ref[b * n_bands + t]

    py = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, width), 0).astype(jnp.float32)
        + jnp.float32(row0)
        + 0.5
    )
    px = (
        jax.lax.broadcasted_iota(jnp.int32, (TILE_H, width), 1).astype(jnp.float32)
        + 0.5
    )

    def face_body(j, carry):
        izbuf, sbuf, rbuf, gbuf, bbuf = carry
        o = REC * idx_ref[j]
        e01 = tab_ref[o + 0] * px + tab_ref[o + 1] * py + tab_ref[o + 2]
        e12 = tab_ref[o + 3] * px + tab_ref[o + 4] * py + tab_ref[o + 5]
        e20 = tab_ref[o + 6] * px + tab_ref[o + 7] * py + tab_ref[o + 8]
        inv_z = tab_ref[o + 9] * px + tab_ref[o + 10] * py + tab_ref[o + 11]

        inside = (e01 >= 0) & (e12 >= 0) & (e20 >= 0)
        better = inside & (inv_z > izbuf)  # larger 1/z = closer
        izbuf = jnp.where(better, inv_z, izbuf)
        sbuf = jnp.where(better, tab_ref[o + 12].astype(jnp.int32), sbuf)
        rbuf = jnp.where(better, tab_ref[o + 13], rbuf)
        gbuf = jnp.where(better, tab_ref[o + 14], gbuf)
        bbuf = jnp.where(better, tab_ref[o + 15], bbuf)
        return izbuf, sbuf, rbuf, gbuf, bbuf

    izbuf0 = jnp.zeros((TILE_H, width), jnp.float32)
    sbuf0 = jnp.full((TILE_H, width), -1, jnp.int32)
    zero = jnp.zeros((TILE_H, width), jnp.float32)
    izbuf, sbuf, rbuf, gbuf, bbuf = jax.lax.fori_loop(
        0, n, face_body, (izbuf0, sbuf0, zero, zero, zero)
    )
    iz_out[:] = izbuf
    f_out[:] = sbuf
    r_out[:] = rbuf
    g_out[:] = gbuf
    b_out[:] = bbuf


@functools.partial(jax.jit, static_argnames=("height", "width"))
def pallas_rasterize_tiles(
    fx: jax.Array,  # (B, F, 3) screen x per corner
    fy: jax.Array,  # (B, F, 3)
    finv_z: jax.Array,  # (B, F, 3) 1/z per corner
    ok: jax.Array,  # (B, F) validity
    face_rgb: jax.Array,  # (B, F, 3) pre-shaded flat color
    face_seg: jax.Array,  # (F,) int32 segmentation ids
    height: int,
    width: int,
) -> Tuple[jax.Array, jax.Array, jax.Array, jax.Array]:
    """Returns (zbuf (B,H,W) f32 meters, seg (B,H,W) i32 [-1 = background],
    rgb (B,H,W,3) f32, dropped () i32 total overflow-dropped faces)."""
    B, F, _ = fx.shape
    assert height % TILE_H == 0, height
    T = height // TILE_H
    # face-table padding: 1D SMEM blocks must be multiples of 128 elements
    F_pad = max(128, -(-F // 128) * 128)
    # per-band face-index budget: s32 1D SMEM blocks carry T(1024) tiling,
    # so the block is always 1024 entries (4 KB)
    K = 1024

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
        return (e12[k] * iz0 + e20[k] * iz1 + e01[k] * iz2) * s * inv_area

    rec = jnp.stack(
        [
            e01[0], e01[1], e01[2],
            e12[0], e12[1], e12[2],
            e20[0], e20[1], e20[2],
            zc(0), zc(1), zc(2),
            jnp.broadcast_to(
                jnp.asarray(face_seg, jnp.float32)[None], area.shape
            ),
            face_rgb[..., 0], face_rgb[..., 1], face_rgb[..., 2],
        ],
        axis=-1,
    )  # (B, F, 16)
    table = jnp.zeros((B, F_pad, REC), jnp.float32).at[:, :F].set(rec)
    table = table.reshape(B, F_pad * REC)

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

    # stable compaction of overlapping face ids to the front, truncated at K
    order = jnp.argsort(~overlap, axis=-1, stable=True)  # (B, T, F)
    idx = jnp.zeros((B, T, K), jnp.int32).at[..., : min(K, F)].set(
        order[..., : min(K, F)].astype(jnp.int32)
    )
    counts_raw = jnp.sum(overlap, axis=-1).astype(jnp.int32)  # (B, T)
    counts = jnp.minimum(counts_raw, K)
    dropped = jnp.sum(jnp.maximum(counts_raw - K, 0))

    # --- kernel --------------------------------------------------------------
    # counts ride scalar prefetch (whole (B*T,) array in SMEM); the per-band
    # index lists and the per-env face table are 1D-blocked SMEM windows
    # (sizes multiples of 128 floats). The face table's block index is
    # constant across the (innermost) band axis, so it is DMA'd into SMEM
    # once per env and reused for every band.
    idx_flat = idx.reshape(B * T * K)
    table_flat = table.reshape(B * F_pad * REC)
    idx_spec = pl.BlockSpec(
        (K,), lambda b, t, n_ref: (b * T + t,), memory_space=pltpu.SMEM
    )
    tab_spec = pl.BlockSpec(
        (F_pad * REC,), lambda b, t, n_ref: (b,), memory_space=pltpu.SMEM
    )
    out_spec = pl.BlockSpec((1, 1, TILE_H, width), lambda b, t, n_ref: (b, t, 0, 0))

    def kernel(n_ref, idx_ref, tab_ref, iz_out, f_out, r_out, g_out, b_out):
        _raster_kernel(
            n_ref, idx_ref, tab_ref,
            iz_out.at[0, 0], f_out.at[0, 0],
            r_out.at[0, 0], g_out.at[0, 0], b_out.at[0, 0],
            width=width, n_bands=T,
        )

    shape4 = (B, T, TILE_H, width)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, T),
        in_specs=[idx_spec, tab_spec],
        out_specs=[out_spec] * 5,
    )
    izbuf, sbuf, rbuf, gbuf, bbuf = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(shape4, jnp.float32),
            jax.ShapeDtypeStruct(shape4, jnp.int32),
            jax.ShapeDtypeStruct(shape4, jnp.float32),
            jax.ShapeDtypeStruct(shape4, jnp.float32),
            jax.ShapeDtypeStruct(shape4, jnp.float32),
        ],
    )(counts.reshape(B * T), idx_flat, table_flat)
    izbuf = izbuf.reshape(B, height, width)
    seg = sbuf.reshape(B, height, width)
    rgb = jnp.stack(
        [x.reshape(B, height, width) for x in (rbuf, gbuf, bbuf)], axis=-1
    )
    zbuf = jnp.where(seg >= 0, 1.0 / jnp.maximum(izbuf, 1e-9), 1e9)
    return zbuf, seg, rgb, dropped


def pallas_available(height: int, width: int, num_faces: int = 0) -> bool:
    try:
        import jax

        if jax.devices()[0].platform not in ("tpu", "axon"):
            return False
    except Exception:
        return False
    if num_faces and num_faces > MAX_SMEM_FACES:
        return False
    return height % TILE_H == 0 and width % LANES == 0
