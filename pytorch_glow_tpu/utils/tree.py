"""Param-pytree partitioning: trainable vs frozen leaves.

The Glow param tree mixes trainable floats with structural constants:
the LU permutation's `p_idx` (int) and `sign_s` (fixed +-1 signs — the
reference also freezes them: upstream:network/module.py InvertibleConv1x1
LU mode), and shuffle/reverse permutation index vectors.  `jax.grad` and
optimizers must only ever see the trainable part.

`partition` returns two same-shaped trees where the "other" positions hold
None; `merge` zips them back.  None is treated as a leaf via `is_leaf`, so
both trees share one treedef and optax state maps cleanly onto the
trainable tree.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

FROZEN_NAMES = ("sign_s", "p_idx", "idx", "inv_idx")


def _key_name(entry: Any) -> str:
    for attr in ("name", "key", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def _is_frozen(path, leaf) -> bool:
    if not hasattr(leaf, "dtype"):
        return False
    if not jnp.issubdtype(leaf.dtype, jnp.floating):
        return True
    return bool(path) and _key_name(path[-1]) in FROZEN_NAMES


def _is_none(x) -> bool:
    return x is None


def partition(params):
    """-> (trainable, frozen): same structure, None in the other's slots."""
    trainable = jax.tree_util.tree_map_with_path(
        lambda p, l: None if _is_frozen(p, l) else l, params
    )
    frozen = jax.tree_util.tree_map_with_path(
        lambda p, l: l if _is_frozen(p, l) else None, params
    )
    return trainable, frozen


def merge(trainable, frozen):
    """Inverse of `partition`."""
    return jax.tree.map(
        lambda a, b: b if a is None else a, trainable, frozen, is_leaf=_is_none
    )
