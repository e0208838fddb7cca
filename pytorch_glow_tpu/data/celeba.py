"""CelebA (and CelebA-HQ) image-folder dataset with 40 binary attributes.

Reference behavior (upstream:dataset/celeba.py; SURVEY.md §2.1 #4): image
dir + `list_attr_celeba.txt` -> (image tensor, 40-dim +-1 attribute
vector), resize + center-crop.  TPU-native shape: a thread-pool decodes
JPEGs into uint8 NHWC numpy batches on the host; normalization happens
on-device inside the jitted step.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from pytorch_glow_tpu.config import DataConfig, GlowConfig, TrainConfig

ATTR_FILE = "list_attr_celeba.txt"


def parse_attr_file(path: str) -> tuple[list[str], dict[str, np.ndarray], list[str]]:
    """-> (filenames, {filename: (40,) int8 +-1}, attribute_names)."""
    with open(path) as f:
        lines = f.read().splitlines()
    # Format: count line, header line of attr names, then rows.
    attr_names = lines[1].split()
    files, attrs = [], {}
    for line in lines[2:]:
        parts = line.split()
        if not parts:
            continue
        fname = parts[0]
        vec = np.asarray([int(v) for v in parts[1:]], dtype=np.int8)
        files.append(fname)
        attrs[fname] = vec
    return files, attrs, attr_names


def _load_image(path: str, size: int) -> np.ndarray:
    from PIL import Image

    img = Image.open(path).convert("RGB")
    w, h = img.size
    s = min(w, h)
    img = img.crop(((w - s) // 2, (h - s) // 2, (w + s) // 2, (h + s) // 2))
    img = img.resize((size, size), Image.BILINEAR)
    return np.asarray(img, dtype=np.uint8)


class CelebAFolder:
    """Indexable dataset: images dir (+ optional attr file) on disk."""

    def __init__(self, root: str, image_size: int):
        self.image_size = image_size
        img_dir = None
        for cand in (os.path.join(root, "img_align_celeba"), root):
            if os.path.isdir(cand):
                entries = [
                    e
                    for e in sorted(os.listdir(cand))
                    if e.lower().endswith((".jpg", ".jpeg", ".png"))
                ]
                if entries:
                    img_dir = cand
                    self.files = entries
                    break
        if img_dir is None:
            raise FileNotFoundError(f"no images under {root}")
        self.img_dir = img_dir
        attr_path_candidates = [
            os.path.join(root, ATTR_FILE),
            os.path.join(os.path.dirname(root.rstrip("/")), ATTR_FILE),
        ]
        self.attrs = None
        self.attr_names: list[str] = []
        for p in attr_path_candidates:
            if os.path.isfile(p):
                _, self.attrs, self.attr_names = parse_attr_file(p)
                break

    def __len__(self) -> int:
        return len(self.files)

    def get(self, i: int) -> tuple[np.ndarray, np.ndarray | None]:
        fname = self.files[i]
        img = _load_image(os.path.join(self.img_dir, fname), self.image_size)
        attr = self.attrs.get(fname) if self.attrs is not None else None
        return img, attr


def celeba_batches(
    data_cfg: DataConfig,
    glow_cfg: GlowConfig,
    train_cfg: TrainConfig,
    split: str = "train",
) -> Iterator[dict] | None:
    """Infinite shuffled uint8 batches with thread-pool decode, or None if
    the dataset is not on disk."""
    try:
        ds = CelebAFolder(data_cfg.root, data_cfg.image_size)
    except (FileNotFoundError, NotADirectoryError):
        return None

    from pytorch_glow_tpu.data import native_loader as nl

    use_native = nl.available()

    def gen():
        rng = np.random.default_rng(train_cfg.seed)
        bs = train_cfg.batch_size
        pool = None if use_native else ThreadPoolExecutor(
            max_workers=max(1, data_cfg.num_workers)
        )
        n = len(ds)
        while True:
            order = rng.permutation(n)
            for i in range(0, n - bs + 1, bs):
                idx = order[i : i + bs]
                if use_native:
                    # GIL-free C++ decode+crop+resize batch assembly.
                    paths = [os.path.join(ds.img_dir, ds.files[j]) for j in idx]
                    batch = {
                        "image": nl.decode_batch(
                            paths, ds.image_size, threads=data_cfg.num_workers
                        )
                    }
                    if ds.attrs is not None:
                        batch["attr"] = np.stack(
                            [ds.attrs[ds.files[j]] for j in idx]
                        )
                else:
                    results = list(pool.map(ds.get, idx))
                    batch = {"image": np.stack([r[0] for r in results])}
                    if results[0][1] is not None:
                        batch["attr"] = np.stack([r[1] for r in results])
                yield batch

    return gen()
