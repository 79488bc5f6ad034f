"""Component-form (batch-last) vector math for the physics hot path.

TPU layout rationale: XLA tiles the two minor dims of every materialized
buffer to (8, 128). Batch-first field tensors like (B, nbody, 3) therefore
pad 3 -> 128 lanes (a 40x HBM inflation at B=4096), and the substep becomes
pure bandwidth waste (measured: 7 GB accessed per substep for 350 MFLOP).
In component form a vector field is ONE array shaped (3, nbody, B) — the env
batch rides the 128-lane axis with zero padding, components live on the
cheap major axis, and every elementwise op is perfectly tiled.

Conventions: component axis FIRST, batch axis LAST. Quaternions are (4, ...,
B) wxyz; vectors (3, ..., B). All functions are pure elementwise/stack ops.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def pack3(x, y, z) -> jax.Array:
    return jnp.stack([x, y, z], axis=0)


def cross_c(a: jax.Array, b: jax.Array) -> jax.Array:
    """Cross product of (3, ..., B) vectors."""
    ax, ay, az = a[0], a[1], a[2]
    bx, by, bz = b[0], b[1], b[2]
    return pack3(ay * bz - az * by, az * bx - ax * bz, ax * by - ay * bx)


def dot_c(a: jax.Array, b: jax.Array) -> jax.Array:
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def qmul_c(q: jax.Array, r: jax.Array) -> jax.Array:
    """Hamilton product of (4, ..., B) wxyz quaternions."""
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    rw, rx, ry, rz = r[0], r[1], r[2], r[3]
    return jnp.stack(
        [
            qw * rw - qx * rx - qy * ry - qz * rz,
            qw * rx + qx * rw + qy * rz - qz * ry,
            qw * ry - qx * rz + qy * rw + qz * rx,
            qw * rz + qx * ry - qy * rx + qz * rw,
        ],
        axis=0,
    )


def qconj_c(q: jax.Array) -> jax.Array:
    return jnp.stack([q[0], -q[1], -q[2], -q[3]], axis=0)


def qapply_c(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors v (3, ..., B) by quaternions q (4, ..., B).

    v' = v + 2 w (u x v) + 2 u x (u x v),  u = q.xyz  (11 mul / comp-op form)
    """
    u = q[1:4]
    w = q[0]
    uv = cross_c(u, v)
    uuv = cross_c(u, uv)
    return v + 2.0 * (w * uv + uuv)


def aa_to_quat_c(axis_angle: jax.Array) -> jax.Array:
    """Axis-angle (3, ..., B) -> unit quaternion (4, ..., B)."""
    sq = dot_c(axis_angle, axis_angle)
    ang = jnp.sqrt(jnp.maximum(sq, 1e-18))
    half = 0.5 * ang
    # sin(x/2)/x, Taylor-stable near zero
    small = sq < 1e-12
    sinc = jnp.where(small, 0.5 - sq / 48.0, jnp.sin(half) / jnp.maximum(ang, 1e-18))
    return jnp.concatenate(
        [jnp.cos(half)[None], axis_angle * sinc[None]], axis=0
    )


def qnormalize_c(q: jax.Array) -> jax.Array:
    n = jnp.sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3])
    return q / jnp.maximum(n, 1e-12)[None]


def quat_to_mat_c(q: jax.Array) -> Tuple[Tuple[jax.Array, ...], ...]:
    """Rotation-matrix entries R[i][j] as a 3x3 nest of (..., B) arrays."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    xx, yy, zz = x * x, y * y, z * z
    xy, xz, yz = x * y, x * z, y * z
    wx, wy, wz = w * x, w * y, w * z
    return (
        (1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)),
        (2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)),
        (2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)),
    )


def bf(x: jax.Array) -> jax.Array:
    """(B, ..., k) batch-first -> (k, ..., B) component-first.

    For the common (B, n, k) case this is a transpose to (k, n, B).
    """
    axes = (x.ndim - 1,) + tuple(range(1, x.ndim - 1)) + (0,)
    return jnp.transpose(x, axes)


def fb(x: jax.Array) -> jax.Array:
    """(k, ..., B) component-first -> (B, ..., k) batch-first."""
    axes = (x.ndim - 1,) + tuple(range(1, x.ndim - 1)) + (0,)
    return jnp.transpose(x, axes)
