"""Host data pipeline -> device (HBM) prefetch.

The reference uses torch DataLoader fork-workers (SURVEY.md §2.1 #4, §3.1).
TPU-native shape: a host-side iterator yielding uint8 NHWC numpy batches
(uint8 over PCIe = 4x less transfer than f32; dequantize/normalize run
on-device inside the jitted step), a thread-pool for image decode, and a
small device-side prefetch queue so host IO overlaps device compute.

Datasets:
* synthetic  — deterministic random uint8 images (+labels), for smoke tests
               and benchmarks on machines with no datasets on disk.
* cifar10    — the standard python-pickle batches if present under root.
* celeba     — image folder + 40-attribute file (data/celeba.py).
"""

from __future__ import annotations

import os
import pickle
import queue
import threading
from collections.abc import Iterator
from typing import Any, Callable

import jax
import numpy as np

from pytorch_glow_tpu.config import DataConfig, GlowConfig, TrainConfig

Batch = dict[str, np.ndarray]


# ---------------------------------------------------------------------------
# Synthetic
# ---------------------------------------------------------------------------


def synthetic_batches(
    batch_size: int,
    image_shape: tuple[int, int, int],
    y_classes: int | None = None,
    seed: int = 0,
    smooth: bool = False,
) -> Iterator[Batch]:
    """Deterministic random uint8 batches; infinite.

    smooth=False: uniform noise (incompressible; NLL floor = 8 bits/dim —
    useful for throughput/smoke runs).
    smooth=True: per-image color gradients + low noise (highly compressible —
    a flow must drive bits/dim well below 8, used for learning-regression
    tests)."""
    rng = np.random.default_rng(seed)
    h, w, c = image_shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    yy, xx = yy / max(1, h - 1), xx / max(1, w - 1)
    while True:
        if smooth:
            base = rng.uniform(0, 255, size=(batch_size, 1, 1, c)).astype(np.float32)
            gy = rng.uniform(-80, 80, size=(batch_size, 1, 1, c)).astype(np.float32)
            gx = rng.uniform(-80, 80, size=(batch_size, 1, 1, c)).astype(np.float32)
            img = base + gy * yy[None, :, :, None] + gx * xx[None, :, :, None]
            img += rng.normal(0, 2.0, size=img.shape).astype(np.float32)
            image = np.clip(img, 0, 255).astype(np.uint8)
        else:
            image = rng.integers(0, 256, size=(batch_size, h, w, c), dtype=np.uint8)
        batch: Batch = {"image": image}
        if y_classes:
            batch["label"] = rng.integers(0, y_classes, size=(batch_size,))
        yield batch


# ---------------------------------------------------------------------------
# CIFAR-10 (python pickle format)
# ---------------------------------------------------------------------------


def _find_cifar_dir(root: str) -> str | None:
    candidates = [root, os.path.join(root, "cifar-10-batches-py")]
    for c in candidates:
        if c and os.path.isfile(os.path.join(c, "data_batch_1")):
            return c
    return None


def load_cifar10(root: str, split: str = "train") -> tuple[np.ndarray, np.ndarray] | None:
    """-> (images uint8 (N,32,32,3), labels int64 (N,)) or None if absent."""
    d = _find_cifar_dir(root)
    if d is None:
        return None
    files = (
        [f"data_batch_{i}" for i in range(1, 6)] if split == "train" else ["test_batch"]
    )
    imgs, labels = [], []
    for f in files:
        with open(os.path.join(d, f), "rb") as fh:
            entry = pickle.load(fh, encoding="bytes")
        x = entry[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        imgs.append(x)
        labels.append(np.asarray(entry[b"labels"]))
    return np.concatenate(imgs).astype(np.uint8), np.concatenate(labels)


def array_batches(
    images: np.ndarray,
    labels: np.ndarray | None,
    batch_size: int,
    seed: int = 0,
    shuffle: bool = True,
    drop_remainder: bool = True,
    repeat: bool = True,
) -> Iterator[Batch]:
    """Epoch-shuffled batches over in-memory arrays; infinite if repeat."""
    n = images.shape[0]
    rng = np.random.default_rng(seed)
    while True:
        order = rng.permutation(n) if shuffle else np.arange(n)
        end = n - (n % batch_size) if drop_remainder else n
        for i in range(0, end, batch_size):
            idx = order[i : i + batch_size]
            b: Batch = {"image": images[idx]}
            if labels is not None:
                b["label"] = labels[idx]
            yield b
        if not repeat:
            return


# ---------------------------------------------------------------------------
# Downsampled ImageNet (npz shards: train_data_batch_*.npz / val_data.npz)
# ---------------------------------------------------------------------------


def load_imagenet_npz(
    root: str, size: int, split: str = "train"
) -> tuple[np.ndarray, np.ndarray] | None:
    """Standard downsampled-ImageNet npz format: 'data' (N, size*size*3)
    row-major CHW-flattened uint8 + 'labels' (1-based)."""
    import glob as globlib

    pattern = (
        os.path.join(root, "train_data_batch_*.npz")
        if split == "train"
        else os.path.join(root, "val_data*.npz")
    )
    files = sorted(globlib.glob(pattern))
    if not files:
        return None
    imgs, labels = [], []
    for f in files:
        d = np.load(f)
        x = d["data"].reshape(-1, 3, size, size).transpose(0, 2, 3, 1)
        imgs.append(x.astype(np.uint8))
        labels.append(np.asarray(d["labels"]) - 1)
    return np.concatenate(imgs), np.concatenate(labels)


# ---------------------------------------------------------------------------
# Dataset dispatch
# ---------------------------------------------------------------------------


def make_dataset(
    data_cfg: DataConfig,
    glow_cfg: GlowConfig,
    train_cfg: TrainConfig,
    split: str = "train",
) -> Iterator[Batch]:
    """Build the host iterator for a profile; falls back to synthetic with a
    warning when the real dataset is not on disk (offline environments)."""
    bs = train_cfg.batch_size
    if data_cfg.name in ("synthetic", "synthetic_smooth"):
        return synthetic_batches(
            bs,
            glow_cfg.image_shape,
            glow_cfg.y_classes if glow_cfg.y_condition else None,
            seed=train_cfg.seed,
            smooth=data_cfg.name == "synthetic_smooth",
        )
    if data_cfg.name == "imagenet64":
        loaded = load_imagenet_npz(data_cfg.root, data_cfg.image_size, split)
        if loaded is not None:
            return array_batches(*loaded, bs, seed=train_cfg.seed, shuffle=split == "train")
    if data_cfg.name == "cifar10":
        loaded = load_cifar10(data_cfg.root, split)
        if loaded is not None:
            return array_batches(*loaded, bs, seed=train_cfg.seed, shuffle=split == "train")
    if data_cfg.name in ("celeba", "celebahq"):
        from pytorch_glow_tpu.data.celeba import celeba_batches

        it = celeba_batches(data_cfg, glow_cfg, train_cfg, split)
        if it is not None:
            return it
    print(
        f"[data] dataset '{data_cfg.name}' not found under root="
        f"'{data_cfg.root}'; using synthetic data"
    )
    return synthetic_batches(
        bs,
        glow_cfg.image_shape,
        glow_cfg.y_classes if glow_cfg.y_condition else None,
        seed=train_cfg.seed,
    )


# ---------------------------------------------------------------------------
# Device prefetch
# ---------------------------------------------------------------------------


def device_prefetch(
    it: Iterator[Batch],
    sharding=None,
    size: int = 2,
    transform: Callable[[Batch], Any] | None = None,
) -> Iterator[Any]:
    """Background thread moves host batches to device (with the global-batch
    sharding under a mesh) ahead of consumption, overlapping IO with compute.

    This is the tf.data/Grain "prefetch to HBM" equivalent from the north
    star, with no TF dependency on the hot path.
    """
    q: queue.Queue = queue.Queue(maxsize=size)
    stop = object()

    def worker():
        try:
            for batch in it:
                if transform is not None:
                    batch = transform(batch)
                if sharding is not None:
                    batch = jax.device_put(batch, jax.tree.map(lambda _: sharding, batch))
                else:
                    batch = jax.device_put(batch)
                q.put(batch)
        finally:
            q.put(stop)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is stop:
            return
        yield item
