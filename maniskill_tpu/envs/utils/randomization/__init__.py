from .batched_rng import BatchedRNG
