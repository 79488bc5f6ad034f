"""Batched rigid-transform ``Pose`` struct.

TPU-native counterpart of the reference's ``mani_skill/utils/structs/pose.py``
(batched (N, 7) wxyz pose with ``create_from_pq`` broadcasting, ``__mul__``
composition, ``inv`` and matrix conversion). Here the storage is a single jax
array ``raw_pose`` of shape (..., 7) = [p(3), q_wxyz(4)], registered as a
pytree so Poses flow through jit/vmap/scan transparently.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.geometry import rotation_conversions as rc

Array = jax.Array


def _backend(*arrays):
    """numpy for host data, jnp when any input is a jax array/tracer.

    Scene construction (builders, loaders, camera configs) composes poses on
    the host; routing those through numpy means env construction never
    touches the device (gates the round-2 bench failure class: a wedged TPU
    must not break ``gym.make``)."""
    return jnp if any(isinstance(a, jax.Array) for a in arrays) else np


def _quat_mul(xp, a, b):
    aw, ax, ay, az = a[..., 0], a[..., 1], a[..., 2], a[..., 3]
    bw, bx, by, bz = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return xp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def _quat_apply(xp, q, v):
    w = q[..., :1]
    u = q[..., 1:]
    uxv = xp.cross(u, v)
    return v + 2.0 * (w * uxv + xp.cross(u, uxv))


@jax.tree_util.register_pytree_node_class
class Pose:
    __slots__ = ("raw_pose",)

    def __init__(self, raw_pose):
        if isinstance(raw_pose, (jax.Array, np.ndarray)):
            self.raw_pose = raw_pose
        else:
            self.raw_pose = np.asarray(raw_pose, np.float32)

    # -- pytree protocol -------------------------------------------------
    def tree_flatten(self):
        return (self.raw_pose,), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = object.__new__(cls)
        obj.raw_pose = children[0]
        return obj

    # -- constructors ----------------------------------------------------
    @classmethod
    def create(cls, pose: Union["Pose", Array]) -> "Pose":
        if isinstance(pose, Pose):
            return pose
        if isinstance(pose, jax.Array):
            return cls(pose)
        return cls(np.asarray(pose, np.float32))

    @classmethod
    def create_from_pq(cls, p=None, q=None) -> "Pose":
        """Create from position/quaternion with mutual broadcasting.

        Mirrors reference pose.py:88-156: unbatched ``p`` or ``q`` are
        broadcast against the other argument's batch shape. Host (numpy/list)
        inputs stay on the host; jax inputs stay on device.
        """
        xp = _backend(p, q)
        if p is None:
            p = xp.zeros(3, dtype=xp.float32)
        if q is None:
            q = xp.asarray([1.0, 0.0, 0.0, 0.0], dtype=xp.float32)
        p = xp.asarray(p, dtype=xp.float32)
        q = xp.asarray(q, dtype=xp.float32)
        batch = np.broadcast_shapes(p.shape[:-1], q.shape[:-1])
        p = xp.broadcast_to(p, batch + (3,))
        q = xp.broadcast_to(q, batch + (4,))
        return cls(xp.concatenate([p, q], axis=-1))

    @classmethod
    def identity(cls, batch_shape=(), dtype=jnp.float32) -> "Pose":
        raw = jnp.zeros(batch_shape + (7,), dtype=dtype)
        raw = raw.at[..., 3].set(1.0)
        return cls(raw)

    @classmethod
    def from_matrix(cls, m: Array) -> "Pose":
        q = rc.matrix_to_quaternion(m[..., :3, :3])
        return cls(jnp.concatenate([m[..., :3, 3], q], axis=-1))

    # -- accessors -------------------------------------------------------
    @property
    def p(self) -> Array:
        return self.raw_pose[..., :3]

    @property
    def q(self) -> Array:
        return self.raw_pose[..., 3:]

    @property
    def shape(self):
        return self.raw_pose.shape[:-1]

    def __len__(self):
        return self.raw_pose.shape[0]

    def __getitem__(self, idx) -> "Pose":
        return Pose(self.raw_pose[idx])

    # -- functional "setters" (jax arrays are immutable) -----------------
    def replace(self, p: Optional[Array] = None, q: Optional[Array] = None) -> "Pose":
        raw = self.raw_pose
        if isinstance(raw, np.ndarray) and _backend(p, q) is np:
            raw = raw.copy()
            if p is not None:
                raw[..., :3] = np.asarray(p, raw.dtype)
            if q is not None:
                raw[..., 3:] = np.asarray(q, raw.dtype)
            return Pose(raw)
        raw = jnp.asarray(raw)
        if p is not None:
            raw = raw.at[..., :3].set(jnp.broadcast_to(jnp.asarray(p, raw.dtype), raw[..., :3].shape))
        if q is not None:
            raw = raw.at[..., 3:].set(jnp.broadcast_to(jnp.asarray(q, raw.dtype), raw[..., 3:].shape))
        return Pose(raw)

    set_p = replace  # convenience alias: pose.set_p(p=...)

    # -- algebra ---------------------------------------------------------
    def __mul__(self, other: Union["Pose", Array]) -> "Pose":
        """Pose composition: (self * other)(x) == self(other(x))."""
        other = Pose.create(other)
        xp = _backend(self.raw_pose, other.raw_pose)
        a, b = self.raw_pose, other.raw_pose
        p = a[..., :3] + _quat_apply(xp, a[..., 3:], b[..., :3])
        q = _quat_mul(xp, a[..., 3:], b[..., 3:])
        batch = np.broadcast_shapes(p.shape[:-1], q.shape[:-1])
        p = xp.broadcast_to(p, batch + (3,))
        q = xp.broadcast_to(q, batch + (4,))
        return Pose(xp.concatenate([p, q], axis=-1))

    def inv(self) -> "Pose":
        xp = _backend(self.raw_pose)
        q_inv = self.q * xp.asarray([1.0, -1.0, -1.0, -1.0], self.raw_pose.dtype)
        p = -_quat_apply(xp, q_inv, self.p)
        return Pose(xp.concatenate([p, q_inv], axis=-1))

    def transform_point(self, point: Array) -> Array:
        xp = _backend(self.raw_pose, point)
        return self.p + _quat_apply(xp, self.q, xp.asarray(point))

    def to_transformation_matrix(self) -> Array:
        if isinstance(self.raw_pose, np.ndarray):
            w, x, y, z = (self.q[..., i] for i in range(4))
            rot = np.stack(
                [
                    1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
                    2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
                    2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
                ],
                axis=-1,
            ).reshape(self.shape + (3, 3))
            m = np.zeros(self.shape + (4, 4), dtype=self.raw_pose.dtype)
            m[..., :3, :3] = rot
            m[..., :3, 3] = self.p
            m[..., 3, 3] = 1.0
            return m
        rot = rc.quaternion_to_matrix(self.q)
        m = jnp.zeros(self.shape + (4, 4), dtype=self.raw_pose.dtype)
        m = m.at[..., :3, :3].set(rot)
        m = m.at[..., :3, 3].set(self.p)
        m = m.at[..., 3, 3].set(1.0)
        return m

    def __repr__(self):
        return f"Pose(shape={self.shape})"


def vectorize_pose(pose: Union[Pose, Array]) -> Array:
    return Pose.create(pose).raw_pose
