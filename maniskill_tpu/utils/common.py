"""Common batched helpers (counterpart of mani_skill/utils/common.py).

jax-first: everything the reference does with torch tensors is done with jax
arrays here; numpy conversion happens only at explicit user request
(``to_numpy``), never inside the hot path.
"""
from __future__ import annotations

from collections import OrderedDict
from typing import Any, Dict, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

Array = jax.Array


def to_tensor(x: Any, dtype=None) -> Array:
    """Convert array-like / nested numbers to a jax array."""
    if isinstance(x, jax.Array):
        return x.astype(dtype) if dtype is not None else x
    arr = jnp.asarray(x)
    if dtype is not None:
        arr = arr.astype(dtype)
    elif arr.dtype == jnp.float64:
        arr = arr.astype(jnp.float32)
    return arr


def to_numpy(x: Any) -> Any:
    if isinstance(x, dict):
        return {k: to_numpy(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return type(x)(to_numpy(v) for v in x)
    if isinstance(x, jax.Array):
        return np.asarray(x)
    return x


def batch(x: Any) -> Any:
    """Add a leading batch dim to array-likes (mirrors common.batch)."""
    if isinstance(x, dict):
        return {k: batch(v) for k, v in x.items()}
    arr = to_tensor(x)
    return arr[None]


def unbatch(x: Any) -> Any:
    if isinstance(x, dict):
        return {k: unbatch(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return type(x)(unbatch(v) for v in x)
    if isinstance(x, (jax.Array, np.ndarray)) and x.ndim > 0 and x.shape[0] == 1:
        return x[0]
    return x


def flatten_state_dict(state_dict: Dict, use_jax: bool = True) -> Array:
    """Flatten a nested dict of batched arrays into one (B, D) vector.

    Mirrors reference common.py:195-264 (ordered, recursive, column concat).
    """
    leaves = []

    def visit(d):
        for k in d:
            v = d[k]
            if isinstance(v, dict):
                visit(v)
            else:
                arr = to_tensor(v)
                if arr.ndim == 0:
                    continue
                if arr.ndim == 1:
                    arr = arr[:, None]
                elif arr.ndim > 2:
                    arr = arr.reshape(arr.shape[0], -1)
                leaves.append(arr.astype(jnp.float32))

    visit(state_dict)
    if not leaves:
        return jnp.zeros((0,), jnp.float32)
    return jnp.concatenate(leaves, axis=-1)


def flatten_dict_keys(d: Dict, prefix: str = "") -> Dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, dict):
            out.update(flatten_dict_keys(v, prefix + k + "/"))
        else:
            out[prefix + k] = v
    return out


def append_dict_array(x1, x2):
    """Recursively concatenate nested dict arrays along axis 0."""
    if isinstance(x1, dict):
        return {k: append_dict_array(x1[k], x2[k]) for k in x1}
    return np.concatenate([np.asarray(x1), np.asarray(x2)], axis=0)


def index_dict_array(x, idx):
    if isinstance(x, dict):
        return {k: index_dict_array(v, idx) for k, v in x.items()}
    return x[idx]


def compute_angle_between(x1: Array, x2: Array) -> Array:
    """Batched angle between vectors (common.py counterpart)."""
    n1 = x1 / jnp.maximum(jnp.linalg.norm(x1, axis=-1, keepdims=True), 1e-9)
    n2 = x2 / jnp.maximum(jnp.linalg.norm(x2, axis=-1, keepdims=True), 1e-9)
    return jnp.arccos(jnp.clip(jnp.sum(n1 * n2, axis=-1), -1.0, 1.0))


def tree_replace_masked(old, new, mask: Array):
    """Per-env masked update of a pytree: where(mask) take new else old.

    The TPU-native replacement of the reference's ``scene._reset_mask``
    plumbing (SURVEY.md §3.4): partial reset is a ``where`` over the state
    pytree.
    """

    def f(o, n):
        m = mask.reshape(mask.shape + (1,) * (o.ndim - 1))
        return jnp.where(m, n, o)

    return jax.tree_util.tree_map(f, old, new)
