"""Orbax checkpoint/resume (reference: snapshot save/load of model +
optimizer + global step in upstream:misc/util.py / network/builder.py;
SURVEY.md §3.5, §5).

State saved: the whole train-state pytree (params incl. DDI'd actnorms,
opt_state, step, rng key) — everything needed to continue bit-for-bit.
Keeps the N latest snapshots, like the reference's rolling snapshots.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)

    def save(self, step: int, state: Any, wait: bool = False) -> None:
        # jax random keys are typed; store raw uint32 key data alongside.
        savable = _to_savable(state)
        self._mgr.save(step, args=ocp.args.StandardSave(savable))
        if wait:
            self._mgr.wait_until_finished()

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: int | None = None) -> Any | None:
        """Restore into the structure of `state_like` (a concrete or abstract
        state pytree).  Returns None when no checkpoint exists."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        template = _to_savable(state_like)
        restored = self._mgr.restore(step, args=ocp.args.StandardRestore(template))
        return _from_savable(restored, state_like)

    def wait(self) -> None:
        self._mgr.wait_until_finished()

    def close(self) -> None:
        self._mgr.close()


def _to_savable(state: Any) -> Any:
    """Replace typed PRNG keys with raw uint32 key data (orbax-friendly)."""

    def conv(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return jax.random.key_data(x)
        return x

    return jax.tree.map(conv, state)


def _from_savable(restored: Any, state_like: Any) -> Any:
    """Re-wrap raw key data wherever `state_like` holds a typed key."""

    def conv(like, val):
        if isinstance(like, jax.Array) and jax.dtypes.issubdtype(
            like.dtype, jax.dtypes.prng_key
        ):
            return jax.random.wrap_key_data(np.asarray(val).astype(np.uint32))
        return val

    return jax.tree.map(conv, state_like, restored)
