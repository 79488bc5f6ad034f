"""Per-env batched RNG (counterpart of
mani_skill/envs/utils/randomization/batched_rng.py:14-80).

The reference keeps one numpy RandomState per env so episode content depends
only on that env's seed — giving CPU/GPU cross-backend determinism. Here each
env carries a jax PRNG key; draws are vmapped per env, so the same per-env
seed produces the same episode content regardless of batch size or device —
the same contract, functionally.
"""
from __future__ import annotations

from typing import Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np


class BatchedRNG:
    def __init__(self, keys: jax.Array):
        """keys: (B, 2) uint32 per-env PRNG keys."""
        self.keys = keys

    @classmethod
    def from_seeds(cls, seeds: Sequence[int]) -> "BatchedRNG":
        keys = jnp.stack([jax.random.PRNGKey(int(s)) for s in seeds])
        return cls(keys)

    @property
    def batch_size(self) -> int:
        return self.keys.shape[0]

    def _next(self) -> jax.Array:
        split = jax.vmap(lambda k: jax.random.split(k, 2))(self.keys)
        self.keys = split[:, 0]
        return split[:, 1]

    def uniform(self, low=0.0, high=1.0, size=()) -> jax.Array:
        """(B, *size) uniform draws; `size` excludes the batch dim."""
        if isinstance(size, int):
            size = (size,)
        sub = self._next()
        low = jnp.asarray(low, jnp.float32)
        high = jnp.asarray(high, jnp.float32)
        draw = jax.vmap(
            lambda k: jax.random.uniform(k, size, jnp.float32)
        )(sub)
        return low + (high - low) * draw

    rand = uniform

    def normal(self, loc=0.0, scale=1.0, size=()) -> jax.Array:
        if isinstance(size, int):
            size = (size,)
        sub = self._next()
        draw = jax.vmap(lambda k: jax.random.normal(k, size, jnp.float32))(sub)
        return loc + scale * draw

    randn = normal

    def randint(self, low, high=None, size=()) -> jax.Array:
        if high is None:
            low, high = 0, low
        if isinstance(size, int):
            size = (size,)
        sub = self._next()
        return jax.vmap(
            lambda k: jax.random.randint(k, size, low, high, jnp.int32)
        )(sub)

    def choice(self, n: int, size=()) -> jax.Array:
        return self.randint(0, n, size)

    def quaternions(self, lock_x=False, lock_y=False, lock_z=False) -> jax.Array:
        """Per-env random unit quaternions with optional axis locks
        (randomization/pose.py parity)."""
        from ....utils.geometry import rotation_conversions as rc

        if lock_x and lock_y and not lock_z:
            ang = self.uniform(0.0, 2 * np.pi)
            zeros = jnp.zeros_like(ang)
            return rc.axis_angle_to_quaternion(
                jnp.stack([zeros, zeros, ang], axis=-1)
            )
        sub = self._next()
        q = jax.vmap(lambda k: jax.random.normal(k, (4,), jnp.float32))(sub)
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True)
