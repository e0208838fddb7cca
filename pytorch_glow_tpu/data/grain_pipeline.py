"""Grain-based input pipeline (north-star: "tf.data/Grain host pipeline
with device prefetch").

This is the PRODUCTION loader for on-disk datasets (`DataConfig.loader`
"auto"/"grain"; pipeline.make_dataset dispatches here): `grain.DataLoader`
gives deterministic global shuffling, optional worker-PROCESS decode
(`DataConfig.grain_workers`), per-process record sharding under
`jax.process_count() > 1`, and checkpointable iteration state —
`GrainIterator` exposes the same `get_state`/`set_state` surface as the
indexed fallback path, so Orbax resume restores the exact stream position
in O(1).  Everything degrades to data/pipeline.py when grain is not
installed or no source exists on disk.
"""

from __future__ import annotations

import os
from typing import Any

import numpy as np

from pytorch_glow_tpu.config import DataConfig, GlowConfig, TrainConfig

try:
    import grain.python as grain

    GRAIN_AVAILABLE = True
except Exception:  # pragma: no cover - grain is baked into this image
    grain = None
    GRAIN_AVAILABLE = False


class _ArraySource:
    """grain RandomAccessDataSource over in-memory arrays."""

    def __init__(self, images: np.ndarray, labels: np.ndarray | None):
        self._images = images
        self._labels = labels

    def __len__(self) -> int:
        return self._images.shape[0]

    def __getitem__(self, idx):
        rec = {"image": self._images[idx]}
        if self._labels is not None:
            rec["label"] = self._labels[idx]
        return rec

    def __repr__(self) -> str:
        # Stable across instances: grain validates `repr(data_source)` when
        # restoring iterator state.
        return (
            f"_ArraySource(n={self._images.shape[0]}, "
            f"shape={self._images.shape[1:]}, "
            f"labels={self._labels is not None})"
        )


class _FolderSource:
    """grain source over an on-disk image folder (native C++ decode)."""

    def __init__(self, folder, image_size: int):
        self.folder = folder
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.folder)

    def __getitem__(self, idx):
        img, meta = self.folder.get(int(idx))
        rec = {"image": img}
        if meta is not None:
            # "attr" for CelebA's 40-attribute vectors, "label" for class
            # subdirectory indices (data/folder.py ImageFolder).
            rec[getattr(self.folder, "meta_key", "attr")] = meta
        return rec

    def __repr__(self) -> str:
        return (
            f"_FolderSource(n={len(self.folder)}, size={self.image_size}, "
            f"dir={getattr(self.folder, 'img_dir', '?')})"
        )


class _TFRecordSource:
    """grain RandomAccessDataSource over tfds-prepared TFRecord shards
    (pure-Python reader, data/tfrecord.py).

    PNG/JPEG decode happens inside `__getitem__`, i.e. in the grain worker
    PROCESS when `DataConfig.grain_workers > 0` — on multi-core production
    hosts this overlaps image decode with device compute, which the
    single-threaded indexed tfrecord path cannot (the north-star CIFAR-10
    run consumes ~3.7k images/s/chip; one core cannot decode that)."""

    def __init__(self, paths: list[str], image_size: int):
        from pytorch_glow_tpu.data import tfrecord

        self.image_size = image_size
        self._shards = tfrecord._ShardSet(paths)
        if len(self._shards) == 0:
            raise ValueError(f"no records in TFRecord shards {paths}")
        # Probe the first record once: label/attribute presence is a
        # dataset property.
        ex = tfrecord.parse_example(self._shards.read(0))
        self._has_label = bool(ex.get("label"))
        self._has_attr = bool(ex.get("attributes"))

    def __len__(self) -> int:
        return len(self._shards)

    def __getitem__(self, idx):
        from pytorch_glow_tpu.data import tfrecord

        ex = tfrecord.parse_example(self._shards.read(int(idx)))
        if "image" not in ex:
            raise ValueError(
                f"record {idx} has no 'image' feature (keys: {sorted(ex)})"
            )
        rec = {"image": tfrecord._decode_image(ex["image"], self.image_size)}
        if self._has_label and ex.get("label"):
            rec["label"] = np.int64(ex["label"][0])
        if self._has_attr and ex.get("attributes"):
            rec["attr"] = np.asarray(ex["attributes"], np.int64)
        return rec

    def __repr__(self) -> str:
        # Stable across instances: grain validates `repr(data_source)` when
        # restoring iterator state.
        names = [os.path.basename(p) for p in self._shards.paths]
        return (
            f"_TFRecordSource(n={len(self._shards)}, size={self.image_size}, "
            f"shards={names})"
        )


class GrainIterator:
    """Uniform checkpointable-iterator facade over a grain DataLoader.

    get_state/set_state carry grain's native opaque state (bytes) under the
    same protocol the indexed pipeline uses, so the Builder/CheckpointManager
    treat both loaders identically.
    """

    def __init__(self, loader):
        self._it = iter(loader)

    def __iter__(self):
        return self

    def __next__(self):
        return next(self._it)

    def get_state(self) -> dict:
        return {"grain": self._it.get_state()}

    def set_state(self, state: dict) -> None:
        raw = state["grain"]
        if isinstance(raw, str):
            raw = raw.encode()
        self._it.set_state(raw)


def _make_source(
    data_cfg: DataConfig,
    glow_cfg: GlowConfig,
    train_cfg: TrainConfig,
    split: str,
):
    if data_cfg.name == "cifar10":
        from pytorch_glow_tpu.data.pipeline import load_cifar10

        loaded = load_cifar10(data_cfg.root, split)
        if loaded is not None:
            return _ArraySource(*loaded)
    elif data_cfg.name == "imagenet64":
        from pytorch_glow_tpu.data.pipeline import load_imagenet_npz

        loaded = load_imagenet_npz(data_cfg.root, data_cfg.image_size, split)
        if loaded is not None:
            return _ArraySource(*loaded)
    elif data_cfg.name in ("celeba", "celebahq"):
        from pytorch_glow_tpu.data.celeba import CelebAFolder

        try:
            return _FolderSource(
                CelebAFolder(data_cfg.root, data_cfg.image_size, split),
                data_cfg.image_size,
            )
        except (FileNotFoundError, NotADirectoryError):
            pass  # fall through to the TFRecord probe below
    elif data_cfg.name == "image_folder":
        from pytorch_glow_tpu.data.folder import ImageFolder

        try:
            return _FolderSource(
                ImageFolder(data_cfg.root, data_cfg.image_size, split),
                data_cfg.image_size,
            )
        except (FileNotFoundError, NotADirectoryError):
            pass  # fall through to the TFRecord probe below
    elif data_cfg.name in ("synthetic", "synthetic_smooth", "synthetic_textured"):
        rng = np.random.default_rng(train_cfg.seed)
        h, w, c = glow_cfg.image_shape
        images = rng.integers(0, 256, (max(2048, train_cfg.batch_size * 4), h, w, c),
                              dtype=np.uint8)
        return _ArraySource(images, None)
    # Any dataset name: tfds-prepared TFRecord shards under root (the same
    # discovery the indexed tfrecord path uses, but decode runs in grain
    # worker processes and iteration state is grain's opaque checkpoint).
    from pytorch_glow_tpu.data import tfrecord

    paths = tfrecord.find_split_shards(data_cfg, split)
    if paths:
        return _TFRecordSource(paths, data_cfg.image_size)
    return None


def make_grain_loader(
    data_cfg: DataConfig,
    glow_cfg: GlowConfig,
    train_cfg: TrainConfig,
    split: str = "train",
) -> Any | None:
    """-> grain.DataLoader of {"image": uint8 (B,H,W,C), ...} batches or
    None (grain missing / no source on disk).

    Deterministic under `train_cfg.seed`.  Under `jax.process_count() > 1`
    records are sharded across processes (disjoint reads) and each process
    batches its share of the global batch.
    """
    if not GRAIN_AVAILABLE:
        return None
    source = _make_source(data_cfg, glow_cfg, train_cfg, split)
    if source is None:
        return None

    from pytorch_glow_tpu.data.pipeline import _proc_slice

    pidx, pcount = _proc_slice()
    shard = (
        grain.ShardOptions(shard_index=pidx, shard_count=pcount, drop_remainder=True)
        if pcount > 1
        else grain.NoSharding()
    )
    assert train_cfg.batch_size % pcount == 0, (train_cfg.batch_size, pcount)
    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=shard,
        shuffle=split == "train",
        # Test split cycles unshuffled (periodic eval islices a few batches
        # per eval across the run).
        num_epochs=None,
        seed=train_cfg.seed,
    )
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(train_cfg.batch_size // pcount, drop_remainder=True)],
        worker_count=data_cfg.grain_workers,
    )


def make_grain_iterator(
    data_cfg: DataConfig,
    glow_cfg: GlowConfig,
    train_cfg: TrainConfig,
    split: str = "train",
) -> GrainIterator | None:
    """The production entry point used by pipeline.make_dataset: a grain
    loader wrapped in the uniform checkpointable-iterator protocol, or None
    when grain/the source is unavailable.  Synthetic data never routes here
    (the indexed generator is already deterministic and O(1)-resumable)."""
    if data_cfg.name in ("synthetic", "synthetic_smooth", "synthetic_textured"):
        return None
    loader = make_grain_loader(data_cfg, glow_cfg, train_cfg, split)
    return GrainIterator(loader) if loader is not None else None
