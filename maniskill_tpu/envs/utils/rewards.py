"""Reward shaping helpers (counterpart of mani_skill/envs/utils/rewards/common.py,
dm_control-style tolerance)."""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _sigmoid(x, value_at_1, kind):
    if kind == "gaussian":
        scale = jnp.sqrt(-2 * jnp.log(value_at_1))
        return jnp.exp(-0.5 * (x * scale) ** 2)
    if kind == "hyperbolic":
        scale = jnp.arccosh(1 / value_at_1)
        return 1.0 / jnp.cosh(x * scale)
    if kind == "long_tail":
        scale = jnp.sqrt(1 / value_at_1 - 1)
        return 1.0 / ((x * scale) ** 2 + 1)
    if kind == "reciprocal":
        scale = 1 / value_at_1 - 1
        return 1.0 / (jnp.abs(x) * scale + 1)
    if kind == "cosine":
        scaled = x * (1 - value_at_1) if False else x
        pi_x = jnp.clip(jnp.abs(x), 0, 1) * np.pi
        return jnp.where(jnp.abs(x) < 1, (1 + jnp.cos(pi_x)) / 2, 0.0)
    if kind == "linear":
        return jnp.clip(1.0 - jnp.abs(x) * (1 - value_at_1), 0.0, 1.0)
    if kind == "quadratic":
        scaled = x * jnp.sqrt(1 - value_at_1)
        return jnp.where(jnp.abs(scaled) < 1, 1 - scaled**2, 0.0)
    if kind == "tanh_squared":
        scale = jnp.arctanh(jnp.sqrt(1 - value_at_1))
        return 1 - jnp.tanh(x * scale) ** 2
    raise ValueError(kind)


def tolerance(
    x,
    bounds=None,
    margin=0.0,
    sigmoid: str = "gaussian",
    value_at_margin: float = 0.1,
    lower: float = 0.0,
    upper: float = 0.0,
):
    """dm_control rewards.tolerance: 1 inside bounds, decays outside."""
    if bounds is not None:
        lower, upper = bounds
    x = jnp.asarray(x, jnp.float32)
    lower = jnp.asarray(lower, jnp.float32)
    upper = jnp.asarray(upper, jnp.float32)
    in_bounds = (x >= lower) & (x <= upper)
    if margin == 0:
        return in_bounds.astype(jnp.float32)
    d = jnp.where(x < lower, lower - x, x - upper) / margin
    value_at_margin = max(value_at_margin, 1e-6)
    return jnp.where(in_bounds, 1.0, _sigmoid(d, value_at_margin, sigmoid))
