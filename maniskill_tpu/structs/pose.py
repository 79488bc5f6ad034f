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

from ..utils.geometry import rotation_conversions as rc

Array = jax.Array


@jax.tree_util.register_pytree_node_class
class Pose:
    __slots__ = ("raw_pose",)

    def __init__(self, raw_pose: Array):
        self.raw_pose = jnp.asarray(raw_pose)

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
        pose = jnp.asarray(pose, dtype=jnp.float32)
        return cls(pose)

    @classmethod
    def create_from_pq(cls, p=None, q=None) -> "Pose":
        """Create from position/quaternion with mutual broadcasting.

        Mirrors reference pose.py:88-156: unbatched ``p`` or ``q`` are
        broadcast against the other argument's batch shape.
        """
        if p is None:
            p = jnp.zeros(3, dtype=jnp.float32)
        if q is None:
            q = jnp.array([1.0, 0.0, 0.0, 0.0], dtype=jnp.float32)
        p = jnp.asarray(p, dtype=jnp.float32)
        q = jnp.asarray(q, dtype=jnp.float32)
        batch = jnp.broadcast_shapes(p.shape[:-1], q.shape[:-1])
        p = jnp.broadcast_to(p, batch + (3,))
        q = jnp.broadcast_to(q, batch + (4,))
        return cls(jnp.concatenate([p, q], axis=-1))

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
        p = self.p + rc.quaternion_apply(self.q, other.p)
        q = rc.quaternion_multiply(self.q, other.q)
        return Pose(jnp.concatenate([p, q], axis=-1))

    def inv(self) -> "Pose":
        q_inv = rc.quaternion_conjugate(self.q)
        p = -rc.quaternion_apply(q_inv, self.p)
        return Pose(jnp.concatenate([p, q_inv], axis=-1))

    def transform_point(self, point: Array) -> Array:
        return self.p + rc.quaternion_apply(self.q, point)

    def to_transformation_matrix(self) -> Array:
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
