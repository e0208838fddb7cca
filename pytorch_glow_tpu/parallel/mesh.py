"""GSPMD device mesh + sharding rules.

The reference's only parallelism is single-process DataParallel replication
(SURVEY.md §2.3).  The TPU-native equivalent is a `jax.sharding.Mesh` with
two axes:

* "data"  — batch dimension sharded across chips; gradient psums ride ICI
            (inserted automatically by GSPMD from the sharding annotations).
* "model" — optional Megatron-style tensor parallelism over the coupling
            net's hidden channels: conv1 is column-parallel (output channels
            sharded), conv2 is row-parallel (input channels sharded, output
            reduced) — XLA inserts the psum.  model=1 (pure DP) is the
            default and the north-star configuration.

No NCCL/MPI analog exists or is needed: annotate shardings, let XLA place
collectives on ICI.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pytorch_glow_tpu.config import MeshConfig

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(cfg: MeshConfig | None = None, devices: list | None = None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    cfg = cfg or MeshConfig()
    shape = cfg.shape(len(devices))
    assert shape[0] * shape[1] == len(devices), (shape, len(devices))
    dev_array = np.asarray(devices).reshape(shape)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Global batch: leading dim over "data", everything else replicated."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _key_name(entry: Any) -> str:
    for attr in ("name", "key", "idx"):
        if hasattr(entry, attr):
            return str(getattr(entry, attr))
    return str(entry)


def param_pspec(path, leaf, tp: bool) -> P:
    """PartitionSpec for one param leaf.

    With tp=False everything is replicated (pure DP).  With tp=True the
    coupling-net hidden channels shard over "model":
      conv1 (column-parallel): w (..., 3,3,Cin,H) -> last axis "model",
             its actnorm bias/logs (H,) -> "model"
      conv2 (row-parallel):    w (..., 1,1,H,H)  -> axis -2 "model"
    Step params carry a leading K axis; specs are padded from the right, so
    only trailing axes matter.
    """
    if not tp:
        return P()
    names = [_key_name(e) for e in path]
    if "coupling" in names:
        if "conv1" in names:
            if names[-1] == "w":
                return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
            if "actnorm" in names:  # bias/logs shaped (..., H)
                return P(*([None] * (leaf.ndim - 1)), MODEL_AXIS)
        if "conv2" in names and names[-1] == "w":
            return P(*([None] * (leaf.ndim - 2)), MODEL_AXIS, None)
    return P()


def put_global(x: Any, sharding: NamedSharding):
    """Place one host/local array onto a (possibly multi-process) sharding.

    `jax.device_put` refuses shardings that span non-addressable devices;
    under `jax.process_count() > 1` every process holds the same host value
    (replicated init / restored snapshot), so each builds its addressable
    shards via `make_array_from_callback`.  Typed PRNG keys round-trip
    through their uint32 key data."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    if isinstance(x, jax.Array) and jax.dtypes.issubdtype(
        x.dtype, jax.dtypes.prng_key
    ):
        impl = jax.random.key_impl(x)
        data = put_global(np.asarray(jax.random.key_data(x)), sharding)
        return jax.random.wrap_key_data(data, impl=impl)
    host = np.asarray(x)
    return jax.make_array_from_callback(host.shape, sharding, lambda idx: host[idx])


def put_global_tree(tree: Any, shardings: Any):
    return jax.tree.map(put_global, tree, shardings)


def param_shardings(mesh: Mesh, params: Any, tp: bool | None = None):
    """NamedSharding tree matching `params` (works for opt_state too via
    tree_map over matching-structure trees)."""
    if tp is None:
        tp = mesh.shape[MODEL_AXIS] > 1
    return jax.tree_util.tree_map_with_path(
        lambda p, l: NamedSharding(mesh, param_pspec(p, l, tp)), params
    )


def shard_params(mesh: Mesh, params: Any, tp: bool | None = None):
    """Place the param tree onto its sharding rules (multi-process safe)."""
    return put_global_tree(params, param_shardings(mesh, params, tp))
