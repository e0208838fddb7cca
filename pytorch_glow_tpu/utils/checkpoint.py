"""Orbax checkpoint/resume (reference: snapshot save/load of model +
optimizer + global step in upstream:misc/util.py / network/builder.py;
SURVEY.md §3.5, §5).

State saved: the whole train-state pytree (params incl. DDI'd actnorms,
opt_state, step, rng key) — everything needed to continue bit-for-bit.
Keeps the N latest snapshots, like the reference's rolling snapshots.
"""

from __future__ import annotations

import base64
import json
import os
import threading
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3):
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._keep = keep
        self._data_dir = os.path.join(self.directory, "data_state")
        options = ocp.CheckpointManagerOptions(max_to_keep=keep, create=True)
        self._mgr = ocp.CheckpointManager(self.directory, options=options)
        # Best-checkpoint tracking (min eval bits/dim): a sibling directory
        # holding the single best snapshot + a JSON sidecar with its metric.
        # The rolling `keep`-window above can rotate the best step out; this
        # one never rotates, so model selection survives long runs.
        self._best_dir = self.directory + "-best"
        self._best_mgr = None
        # Async best-save bookkeeping: the metric of an in-flight best save
        # (so a faster next eval compares against it, not the stale sidecar)
        # and the commit threads that write best.json once orbax finalizes.
        self._best_pending: dict | None = None
        self._best_threads: list[threading.Thread] = []
        self._best_lock = threading.Lock()
        # Failures from async best-save commit threads: surfaced (logged +
        # kept on `last_best_error`) at the next _join_best, and the failed
        # save's _best_pending marker is rolled back so later genuinely
        # better metrics aren't masked by a save that never landed.
        self._best_errors: list[Exception] = []
        self.last_best_error: Exception | None = None

    # -- best-checkpoint tracking ---------------------------------------------

    def _best_meta_path(self) -> str:
        return os.path.join(self._best_dir, "best.json")

    def best_info(self) -> dict | None:
        """{"step": int, "metric": float} of the best snapshot, or None.

        Includes an in-flight async best save (its sidecar lands when orbax
        commits), so back-to-back evals compare against the true best."""
        path = self._best_meta_path()
        disk = None
        if os.path.isfile(path):
            with open(path) as f:
                disk = json.load(f)
        pend = self._best_pending
        if pend is not None and (disk is None or pend["metric"] < disk["metric"]):
            return dict(pend)
        return disk

    def _get_best_mgr(self) -> ocp.CheckpointManager:
        if self._best_mgr is None:
            options = ocp.CheckpointManagerOptions(max_to_keep=1, create=True)
            self._best_mgr = ocp.CheckpointManager(self._best_dir, options=options)
        return self._best_mgr

    def maybe_save_best(self, step: int, state: Any, metric: float) -> bool:
        """Save `state` as the best snapshot iff `metric` (lower is better,
        e.g. eval bits/dim) improves on the stored best.  Returns True when
        a new best was written."""
        prev = self.best_info()
        should = prev is None or float(metric) < float(prev["metric"])
        if jax.process_count() > 1:
            # The save/skip decision must be COLLECTIVE: only process 0
            # writes best.json, so without a shared filesystem other
            # processes would always see prev=None and enter the orbax save
            # barrier while process 0 skips — deadlock.  Broadcast process
            # 0's decision instead of trusting each process's local sidecar.
            from jax.experimental import multihost_utils

            should = bool(
                multihost_utils.broadcast_one_to_all(
                    np.asarray(1 if should else 0, np.int32)
                )
            )
        if not should:
            return False
        mgr = self._get_best_mgr()
        # Async: save() returns after the device→host fetch; the disk write
        # (seconds at paper scale — measured 15 s for the 530 MB cifar10
        # state on this box) happens in orbax's background thread.  The
        # best.json sidecar is only written AFTER orbax commits, so a crash
        # mid-write can never leave it pointing at a broken snapshot; until
        # then `_best_pending` stands in for it (see best_info).
        mgr.save(step, args=ocp.args.StandardSave(_to_savable(state)))
        info = {"step": int(step), "metric": float(metric)}
        self._best_pending = info

        def _commit(info=info):
            try:
                mgr.wait_until_finished()
                if jax.process_index() != 0:
                    return
                with self._best_lock:
                    # Out-of-order commit guard: only advance the sidecar.
                    cur = None
                    if os.path.isfile(self._best_meta_path()):
                        with open(self._best_meta_path()) as f:
                            cur = json.load(f)
                    if cur is not None and cur["metric"] <= info["metric"]:
                        return
                    tmp = self._best_meta_path() + ".tmp"
                    with open(tmp, "w") as f:
                        json.dump(info, f)
                    os.replace(tmp, self._best_meta_path())
            except Exception as e:  # disk full, orbax error, ...
                with self._best_lock:
                    # Roll back the in-flight marker (unless a newer save
                    # already replaced it) so best_info stops advertising a
                    # snapshot that never committed, and record the failure
                    # for _join_best to surface.
                    if self._best_pending is info:
                        self._best_pending = None
                    self._best_errors.append(e)

        th = threading.Thread(target=_commit, daemon=False)
        th.start()
        # Prune finished commit threads so long runs don't accumulate them.
        self._best_threads = [t for t in self._best_threads if t.is_alive()]
        self._best_threads.append(th)
        return True

    def _join_best(self) -> None:
        for th in self._best_threads:
            th.join()
        self._best_threads.clear()
        if self._best_errors:
            import logging

            with self._best_lock:
                errs, self._best_errors = self._best_errors, []
            for e in errs:
                logging.getLogger(__name__).warning(
                    "async best-checkpoint save failed: %r", e
                )
            self.last_best_error = errs[-1]

    def restore_best(self, state_like: Any) -> Any | None:
        """Restore the best-metric snapshot (or None if none was saved)."""
        self._join_best()
        info = self.best_info()
        if info is None:
            return None
        mgr = self._get_best_mgr()
        step = int(info["step"])
        if step not in set(mgr.all_steps()):
            # A hard kill between orbax finalization and the sidecar write
            # (or a failed async save with a stale sidecar) can leave
            # best.json pointing at a step that is not on disk; degrade to
            # the newest committed best snapshot instead of raising.
            fallback = mgr.latest_step()
            if fallback is None:
                return None
            import logging

            logging.getLogger(__name__).warning(
                "best.json points at step %d (not on disk); restoring the "
                "newest committed best snapshot, step %d", step, fallback,
            )
            step = int(fallback)
        return self._restore_adapted(mgr, self._best_dir, step, state_like)

    def _restore_adapted(
        self, mgr: ocp.CheckpointManager, root: str, step: int, state_like: Any
    ) -> Any:
        """Restore `step`, tolerating an EMA-presence mismatch between the
        snapshot and the caller's state template.

        The `ema` subtree exists iff the RUN that wrote the snapshot had
        `train.ema_decay > 0` — which the RESTORING profile may not share
        (e.g. `infer.py` on a soak launched with `--set train.ema_decay=…`,
        or a preset that gained EMA after old checkpoints were written).
        Two directions:
          - disk has `ema`, template doesn't -> restore it anyway (it is
            structurally the trainable partition of `params`) and return it
            in the state, so `--ema` inference works without re-declaring
            the training flag;
          - template has `ema`, disk doesn't -> restore without it, then
            seed EMA from the restored trainables (the same semantics as a
            fresh EMA start at this step).
        """
        template = _to_savable(state_like)
        disk_keys = _disk_top_keys(root, step)
        seed_ema = False
        if isinstance(template, dict) and disk_keys is not None:
            if "ema" in disk_keys and "ema" not in template:
                from pytorch_glow_tpu.train.step import partition

                template = dict(template)
                template["ema"] = partition(template["params"])[0]
            elif "ema" not in disk_keys and "ema" in template:
                template = {k: v for k, v in template.items() if k != "ema"}
                seed_ema = True
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
        out = _from_savable(restored, state_like)
        if seed_ema:
            from pytorch_glow_tpu.train.step import partition

            out = dict(out)
            out["ema"] = jax.tree.map(
                lambda x: jax.numpy.copy(x), partition(out["params"])[0]
            )
        return out

    def save(
        self, step: int, state: Any, wait: bool = False, data_state: Any = None
    ) -> None:
        # jax random keys are typed; store raw uint32 key data alongside.
        savable = _to_savable(state)
        self._mgr.save(step, args=ocp.args.StandardSave(savable))
        if data_state is not None:
            self._save_data_state(step, data_state)
        if wait:
            self._mgr.wait_until_finished()

    # -- data-iterator state sidecar ------------------------------------------
    # The host stream position (IndexedBatches index / grain opaque state)
    # saved beside the orbax step so resume is O(1) — no batch replay.  A
    # small JSON per process, rotated like the orbax snapshots.

    def _data_path(self, step: int) -> str:
        pidx = jax.process_index() if jax.process_count() > 1 else 0
        return os.path.join(self._data_dir, f"step_{step:010d}.p{pidx}.json")

    def _save_data_state(self, step: int, data_state: Any) -> None:
        os.makedirs(self._data_dir, exist_ok=True)
        tmp = self._data_path(step) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(_jsonify(data_state), f)
        os.replace(tmp, self._data_path(step))
        # Rotate alongside orbax's max_to_keep window.
        mine = sorted(
            f for f in os.listdir(self._data_dir)
            if f.endswith(".json") and not f.endswith(".tmp")
        )
        for stale in mine[: -self._keep * max(1, jax.process_count())]:
            try:
                os.remove(os.path.join(self._data_dir, stale))
            except OSError:
                pass

    def restore_data_state(self, step: int) -> Any | None:
        path = self._data_path(step)
        if not os.path.isfile(path):
            return None
        with open(path) as f:
            return _unjsonify(json.load(f))

    def latest_step(self) -> int | None:
        return self._mgr.latest_step()

    def restore(self, state_like: Any, step: int | None = None) -> Any | None:
        """Restore into the structure of `state_like` (a concrete or abstract
        state pytree).  Returns None when no checkpoint exists."""
        step = step if step is not None else self.latest_step()
        if step is None:
            return None
        return self._restore_adapted(self._mgr, self.directory, step, state_like)

    def wait(self) -> None:
        self._mgr.wait_until_finished()
        self._join_best()

    def close(self) -> None:
        self._join_best()
        self._mgr.close()
        if self._best_mgr is not None:
            self._best_mgr.close()


def _jsonify(obj: Any) -> Any:
    """JSON-encode a data-iterator state; bytes (grain) go through base64."""
    if isinstance(obj, bytes):
        return {"__b64__": base64.b64encode(obj).decode()}
    if isinstance(obj, dict):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, np.integer):
        return int(obj)
    return obj


def _unjsonify(obj: Any) -> Any:
    if isinstance(obj, dict):
        if set(obj) == {"__b64__"}:
            return base64.b64decode(obj["__b64__"])
        return {k: _unjsonify(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_unjsonify(v) for v in obj]
    return obj


def _to_savable(state: Any) -> Any:
    """Replace typed PRNG keys with raw uint32 key data (orbax-friendly)."""

    def conv(x):
        if isinstance(x, jax.Array) and jax.dtypes.issubdtype(x.dtype, jax.dtypes.prng_key):
            return jax.random.key_data(x)
        return x

    return jax.tree.map(conv, state)


def _disk_top_keys(root: str, step: int) -> set | None:
    """Top-level keys of the pytree stored at `root/step` (None if unknown).

    Uses the orbax item metadata, so no array data is read."""
    import logging

    path = os.path.join(root, str(step), "default")
    absl_logger = logging.getLogger("absl")
    prev_level = absl_logger.level
    # The item dir has no _CHECKPOINT_METADATA (it lives at the step level);
    # absl warns about that lookup even though the item metadata reads fine.
    absl_logger.setLevel(logging.ERROR)
    try:
        meta = ocp.StandardCheckpointer().metadata(path)
        tree = getattr(meta, "item_metadata", meta)
        return set(tree.keys())
    except Exception:
        return None
    finally:
        absl_logger.setLevel(prev_level)


def _from_savable(restored: Any, state_like: Any) -> Any:
    """Re-wrap raw key data wherever `state_like` holds a typed key.

    Keys present in `restored` but absent from `state_like` (an `ema`
    subtree surfaced by `_restore_adapted`) pass through unchanged."""
    if isinstance(restored, dict) and isinstance(state_like, dict):
        return {
            k: _from_savable(v, state_like[k]) if k in state_like else v
            for k, v in restored.items()
        }

    def conv(like, val):
        if isinstance(like, jax.Array) and jax.dtypes.issubdtype(
            like.dtype, jax.dtypes.prng_key
        ):
            return jax.random.wrap_key_data(np.asarray(val).astype(np.uint32))
        return val

    return jax.tree.map(conv, state_like, restored)
