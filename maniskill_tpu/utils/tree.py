"""Nested-dict tree helpers (counterpart of mani_skill/utils/tree.py:1-34)."""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp


def replace(tree: Dict, new_tree: Dict, mask) -> Dict:
    """Masked recursive replace: where(mask) take new_tree else tree
    (used by reset-to-state obs patching, sapien_env.py:975)."""
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out[k] = replace(v, new_tree[k], mask)
        else:
            m = jnp.asarray(mask)
            m = m.reshape(m.shape + (1,) * (v.ndim - 1))
            out[k] = jnp.where(m, new_tree[k], v)
    return out


def map_structure(fn, tree: Any) -> Any:
    if isinstance(tree, dict):
        return {k: map_structure(fn, v) for k, v in tree.items()}
    return fn(tree)
