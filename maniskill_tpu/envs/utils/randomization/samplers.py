"""Placement samplers (counterpart of
mani_skill/envs/utils/randomization/samplers.py).

``UniformPlacementSampler`` draws K candidate positions per env and picks the
first that keeps a minimum distance from already-placed objects —
rejection sampling with a static candidate budget (jit-compatible).
"""
from __future__ import annotations

from typing import List, Tuple

import jax
import jax.numpy as jnp


class UniformPlacementSampler:
    def __init__(self, bounds, batch_size: int, candidates: int = 16):
        (self.lo, self.hi) = (
            jnp.asarray(bounds[0], jnp.float32),
            jnp.asarray(bounds[1], jnp.float32),
        )
        self.batch_size = batch_size
        self.candidates = candidates
        self._placed: List[Tuple[jax.Array, float]] = []

    def sample(self, rng, radius: float, max_trials: int = None) -> jax.Array:
        """rng: BatchedRNG. Returns (B, 2) placements >= radius away from all
        previous placements (best candidate kept if none satisfy)."""
        K = self.candidates
        dim = self.lo.shape[0]
        cands = rng.uniform(0.0, 1.0, (K, dim)) * (self.hi - self.lo) + self.lo
        if not self._placed:
            pick = cands[:, 0]
        else:
            min_d = jnp.full(cands.shape[:2], jnp.inf)
            for prev, prev_r in self._placed:
                d = jnp.linalg.norm(cands - prev[:, None, :], axis=-1)
                min_d = jnp.minimum(min_d, d - prev_r)
            ok = min_d >= radius
            # first valid candidate, else the farthest one
            first = jnp.argmax(ok, axis=1)
            any_ok = jnp.any(ok, axis=1)
            best = jnp.argmax(min_d, axis=1)
            idx = jnp.where(any_ok, first, best)
            pick = jnp.take_along_axis(cands, idx[:, None, None], axis=1)[:, 0]
        self._placed.append((pick, radius))
        return pick
