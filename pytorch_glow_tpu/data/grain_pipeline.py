"""Grain-based input pipeline (north-star: "tf.data/Grain host pipeline
with device prefetch").

Wraps the same dataset sources as data/pipeline.py in a `grain.DataLoader`
— deterministic global shuffling, worker-process parallelism, and
checkpointable iteration state — for users who want the production Grain
path instead of the built-in thread-pool loader.  Optional: everything
degrades to data/pipeline.py when grain is not installed.
"""

from __future__ import annotations

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


class _FolderSource:
    """grain source over an on-disk image folder (native C++ decode)."""

    def __init__(self, folder, image_size: int):
        self.folder = folder
        self.image_size = image_size

    def __len__(self) -> int:
        return len(self.folder)

    def __getitem__(self, idx):
        img, attr = self.folder.get(int(idx))
        rec = {"image": img}
        if attr is not None:
            rec["attr"] = attr
        return rec


def make_grain_loader(
    data_cfg: DataConfig,
    glow_cfg: GlowConfig,
    train_cfg: TrainConfig,
    split: str = "train",
) -> Any | None:
    """-> iterable of {"image": uint8 (B,H,W,C), ...} or None (unavailable).

    Deterministic under `train_cfg.seed`; iteration state can be
    checkpointed via grain's standard mechanisms.
    """
    if not GRAIN_AVAILABLE:
        return None

    source = None
    if data_cfg.name == "cifar10":
        from pytorch_glow_tpu.data.pipeline import load_cifar10

        loaded = load_cifar10(data_cfg.root, split)
        if loaded is not None:
            source = _ArraySource(*loaded)
    elif data_cfg.name in ("celeba", "celebahq"):
        from pytorch_glow_tpu.data.celeba import CelebAFolder

        try:
            source = _FolderSource(
                CelebAFolder(data_cfg.root, data_cfg.image_size), data_cfg.image_size
            )
        except (FileNotFoundError, NotADirectoryError):
            source = None
    elif data_cfg.name in ("synthetic", "synthetic_smooth"):
        rng = np.random.default_rng(train_cfg.seed)
        h, w, c = glow_cfg.image_shape
        images = rng.integers(0, 256, (max(2048, train_cfg.batch_size * 4), h, w, c),
                              dtype=np.uint8)
        source = _ArraySource(images, None)
    if source is None:
        return None

    sampler = grain.IndexSampler(
        num_records=len(source),
        shard_options=grain.NoSharding(),
        shuffle=split == "train",
        num_epochs=None if split == "train" else 1,
        seed=train_cfg.seed,
    )
    return grain.DataLoader(
        data_source=source,
        sampler=sampler,
        operations=[grain.Batch(train_cfg.batch_size, drop_remainder=True)],
        worker_count=0,  # in-process; raise for multi-worker decode
    )
