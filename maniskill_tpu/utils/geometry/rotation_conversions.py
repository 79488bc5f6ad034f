"""Batched rotation conversions in JAX.

TPU-native counterpart of the reference's batched SO(3) toolbox
(mani_skill/utils/geometry/rotation_conversions.py). All quaternions use the
**wxyz** convention (scalar first), matching the reference and SAPIEN.

Every function is shape-polymorphic over leading batch dimensions and safe to
use inside jit/vmap/scan.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def standardize_quaternion(q: jax.Array) -> jax.Array:
    """Convert quaternion(s) to the canonical form with non-negative real part."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quaternion_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of two wxyz quaternions (broadcasting)."""
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quaternion_conjugate(q: jax.Array) -> jax.Array:
    return q * jnp.array([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


# The reference calls this quaternion_invert; for unit quaternions the inverse
# is the conjugate.
quaternion_invert = quaternion_conjugate


def quaternion_apply(q: jax.Array, point: jax.Array) -> jax.Array:
    """Rotate point(s) by quaternion(s) (broadcasting).

    Uses the expanded form (no temporary quaternion products) which is cheaper
    on the VPU: p' = p + 2*w*(u x p) + 2*(u x (u x p)), u = q.xyz.
    """
    w = q[..., :1]
    u = q[..., 1:]
    uxp = jnp.cross(u, point)
    return point + 2.0 * (w * uxp + jnp.cross(u, uxp))


def quaternion_to_matrix(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz -> (..., 3, 3) rotation matrix."""
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    tx, ty, tz = 2.0 * x, 2.0 * y, 2.0 * z
    twx, twy, twz = tx * w, ty * w, tz * w
    txx, txy, txz = tx * x, ty * x, tz * x
    tyy, tyz, tzz = ty * y, tz * y, tz * z
    m = jnp.stack(
        [
            1.0 - (tyy + tzz), txy - twz, txz + twy,
            txy + twz, 1.0 - (txx + tzz), tyz - twx,
            txz - twy, tyz + twx, 1.0 - (txx + tyy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quaternion(m: jax.Array) -> jax.Array:
    """(..., 3, 3) rotation matrix -> (..., 4) wxyz quaternion.

    Branch-free Shepperd's method: compute all four candidate quaternions and
    select the one with the largest denominator (numerically stable and
    jit-friendly — no data-dependent control flow).
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four candidates (unnormalized), one per dominant component.
    qw = jnp.stack([1.0 + tr, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    qx = jnp.stack([m21 - m12, 1.0 + m00 - m11 - m22, m01 + m10, m02 + m20], axis=-1)
    qy = jnp.stack([m02 - m20, m01 + m10, 1.0 - m00 + m11 - m22, m12 + m21], axis=-1)
    qz = jnp.stack([m10 - m01, m02 + m20, m12 + m21, 1.0 - m00 - m11 + m22], axis=-1)

    scores = jnp.stack(
        [tr, m00 - m11 - m22, m11 - m00 - m22, m22 - m00 - m11], axis=-1
    )
    idx = jnp.argmax(scores, axis=-1)
    cands = jnp.stack([qw, qx, qy, qz], axis=-2)  # (..., 4 cand, 4)
    q = jnp.take_along_axis(cands, idx[..., None, None].astype(jnp.int32), axis=-2)[
        ..., 0, :
    ]
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return standardize_quaternion(q)


def axis_angle_to_quaternion(axis_angle: jax.Array) -> jax.Array:
    """(..., 3) rotation vector -> (..., 4) wxyz quaternion (safe at 0)."""
    angle = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = 0.5 * angle
    # sin(x)/x -> use stable small-angle expansion
    small = angle < 1e-6
    sinc = jnp.where(small, 0.5 - angle * angle / 48.0, jnp.sin(half) / jnp.where(small, 1.0, angle))
    return jnp.concatenate([jnp.cos(half), axis_angle * sinc], axis=-1)


def quaternion_to_axis_angle(q: jax.Array) -> jax.Array:
    """(..., 4) wxyz -> (..., 3) rotation vector."""
    q = standardize_quaternion(q)
    norm = jnp.linalg.norm(q[..., 1:], axis=-1, keepdims=True)
    half = jnp.arctan2(norm, q[..., :1])
    angle = 2.0 * half
    small = norm < 1e-6
    scale = jnp.where(small, 2.0 + angle * angle / 12.0, angle / jnp.where(small, 1.0, norm))
    return q[..., 1:] * scale


def euler_angles_to_quaternion(euler: jax.Array, convention: str = "XYZ") -> jax.Array:
    """Intrinsic Euler angles -> wxyz quaternion.

    ``convention="XYZ"`` matches transforms3d ``euler2quat(ai, aj, ak, "sxyz")``
    as used throughout the reference tasks (static xyz == intrinsic ZYX applied
    as Rz*Ry*Rx... note: sxyz static frame equals intrinsic about reversed
    order; we implement R = R_x(a0) @ R_y(a1) @ R_z(a2) for "XYZ" intrinsic and
    the static variant below composes in reverse).
    """
    def _axis_quat(axis: str, angle: jax.Array) -> jax.Array:
        half = 0.5 * angle
        c, s = jnp.cos(half), jnp.sin(half)
        z = jnp.zeros_like(angle)
        if axis == "X":
            return jnp.stack([c, s, z, z], axis=-1)
        if axis == "Y":
            return jnp.stack([c, z, s, z], axis=-1)
        return jnp.stack([c, z, z, s], axis=-1)

    q = _axis_quat(convention[0], euler[..., 0])
    for i, axis in enumerate(convention[1:], start=1):
        q = quaternion_multiply(q, _axis_quat(axis, euler[..., i]))
    return q


def euler2quat(ai, aj, ak, axes: str = "sxyz") -> jax.Array:
    """transforms3d-compatible helper (static frames only).

    Static-frame sxyz: R = Rz(ak) @ Ry(aj) @ Rx(ai), i.e. intrinsic "ZYX" with
    reversed angle order.
    """
    ai = jnp.asarray(ai, dtype=jnp.float32)
    aj = jnp.asarray(aj, dtype=jnp.float32)
    ak = jnp.asarray(ak, dtype=jnp.float32)
    if axes == "sxyz":
        e = jnp.stack(jnp.broadcast_arrays(ak, aj, ai), axis=-1)
        return euler_angles_to_quaternion(e, "ZYX")
    if axes == "rxyz":  # intrinsic xyz
        e = jnp.stack(jnp.broadcast_arrays(ai, aj, ak), axis=-1)
        return euler_angles_to_quaternion(e, "XYZ")
    raise NotImplementedError(f"euler axes {axes}")


def matrix_to_euler_angles(m: jax.Array, convention: str = "XYZ") -> jax.Array:
    """Rotation matrix -> intrinsic euler angles (XYZ only for now)."""
    if convention != "XYZ":
        raise NotImplementedError(convention)
    # R = Rx(a) Ry(b) Rz(c)
    b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


def random_quaternions(key: jax.Array, n: int, dtype=jnp.float32) -> jax.Array:
    """Uniform random unit quaternions, (n, 4) wxyz."""
    q = jax.random.normal(key, (n, 4), dtype=dtype)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    return standardize_quaternion(q)


def quaternion_slerp(q0: jax.Array, q1: jax.Array, t: jax.Array) -> jax.Array:
    """Spherical linear interpolation between unit quaternions."""
    d = jnp.sum(q0 * q1, axis=-1, keepdims=True)
    q1 = jnp.where(d < 0, -q1, q1)
    d = jnp.abs(d)
    theta = jnp.arccos(jnp.clip(d, -1.0, 1.0))
    sin_t = jnp.sin(theta)
    small = sin_t < 1e-6
    w0 = jnp.where(small, 1.0 - t, jnp.sin((1.0 - t) * theta) / jnp.where(small, 1.0, sin_t))
    w1 = jnp.where(small, t, jnp.sin(t * theta) / jnp.where(small, 1.0, sin_t))
    out = w0 * q0 + w1 * q1
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)


def rotation_6d_to_matrix(d6: jax.Array) -> jax.Array:
    """Zhou et al. continuous 6D rotation representation -> matrix."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(m: jax.Array) -> jax.Array:
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def quat_diff_rad(q0: jax.Array, q1: jax.Array) -> jax.Array:
    """Angle (rad) between two unit quaternions (mirrors utils/common.py:308)."""
    d = jnp.abs(jnp.sum(q0 * q1, axis=-1))
    return 2.0 * jnp.arccos(jnp.clip(d, -1.0, 1.0))


def integrate_quaternion(q: jax.Array, omega: jax.Array, dt) -> jax.Array:
    """Integrate unit quaternion by world-frame angular velocity omega over dt.

    q' = exp(0.5 * dt * omega) * q   (exact exponential-map integration).
    """
    dq = axis_angle_to_quaternion(omega * dt)
    out = quaternion_multiply(dq, q)
    return out / jnp.linalg.norm(out, axis=-1, keepdims=True)
