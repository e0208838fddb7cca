"""CelebA (and CelebA-HQ) image-folder dataset with 40 binary attributes.

Reference behavior (upstream:dataset/celeba.py; SURVEY.md §2.1 #4): image
dir + `list_attr_celeba.txt` -> (image tensor, 40-dim +-1 attribute
vector), resize + center-crop.  TPU-native shape: a thread-pool decodes
JPEGs into uint8 NHWC numpy batches on the host; normalization happens
on-device inside the jitted step.
"""

from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from pytorch_glow_tpu.config import DataConfig, GlowConfig, TrainConfig

ATTR_FILE = "list_attr_celeba.txt"
PARTITION_FILE = "list_eval_partition.txt"


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


def parse_partition_file(path: str) -> dict[str, int]:
    """Standard CelebA split file: filename -> 0 (train) / 1 (val) / 2 (test)."""
    out: dict[str, int] = {}
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) == 2:
                out[parts[0]] = int(parts[1])
    return out


class CelebAFolder:
    """Indexable dataset: images dir (+ optional attr file) on disk.

    `split` uses the official list_eval_partition.txt when present; without
    it, a deterministic last-5%-by-filename holdout serves as the test set
    so eval never sees training images.
    """

    def __init__(self, root: str, image_size: int, split: str = "train"):
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
        # Split discipline: official partition file, else last-5% holdout.
        part_candidates = [
            os.path.join(root, PARTITION_FILE),
            os.path.join(os.path.dirname(root.rstrip("/")), PARTITION_FILE),
        ]
        partition = None
        for p in part_candidates:
            if os.path.isfile(p):
                partition = parse_partition_file(p)
                break
        if partition is not None:
            want = {0} if split == "train" else {2}
            picked = [f for f in self.files if partition.get(f, 0) in want]
            if picked:  # partition file may not cover synthetic test trees
                self.files = picked
        elif split != "train":
            self.files = self.files[-max(1, len(self.files) // 20) :]
        elif len(self.files) >= 20:
            self.files = self.files[: -len(self.files) // 20]

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
):
    """Shuffled uint8 batches with thread-pool (or native C++) decode;
    infinite for train, one epoch for test; O(1)-resumable.  Returns None if
    the dataset is not on disk."""
    from pytorch_glow_tpu.data import native_loader as nl
    from pytorch_glow_tpu.data.pipeline import (
        IndexedBatches,
        _proc_slice,
        _process_rows,
        epoch_permutation,
    )

    try:
        ds = CelebAFolder(data_cfg.root, data_cfg.image_size, split)
    except (FileNotFoundError, NotADirectoryError):
        return None

    use_native = nl.available()
    pool = None if use_native else ThreadPoolExecutor(
        max_workers=max(1, data_cfg.num_workers)
    )
    native_pool = (
        nl.DecodePool(ds.image_size, threads=data_cfg.num_workers)
        if use_native else None
    )
    pending: dict[int, int] = {}  # batch index -> in-flight decode job id
    bs = train_cfg.batch_size
    n = len(ds)
    bpe = n // bs  # full batches per epoch (drop remainder)
    if bpe == 0:
        return None
    shuffle = split == "train"
    pidx, pcount = _proc_slice()
    lo, hi = _process_rows(bs, pidx, pcount)

    def batch_indices(i: int) -> np.ndarray:
        # Test split cycles deterministically (periodic eval islices a few
        # batches per eval); train shuffles per epoch.
        epoch, k = divmod(i, bpe)
        order = epoch_permutation(train_cfg.seed, epoch, n, shuffle)
        idx = order[k * bs : (k + 1) * bs]
        if pcount > 1:
            idx = idx[lo:hi]  # this process decodes only its rows
        return idx

    def submit(i: int) -> int:
        paths = [os.path.join(ds.img_dir, ds.files[j]) for j in batch_indices(i)]
        return native_pool.submit(paths)

    def batch_at(i: int):
        idx = batch_indices(i)
        if use_native:
            # GIL-free C++ decode; batch i was usually submitted while
            # batch i-1 was being consumed (double-buffered lookahead).
            for stale in [b for b in pending if b != i]:
                native_pool.wait(pending.pop(stale))  # non-sequential access
            job = pending.pop(i, None)
            batch = {"image": native_pool.wait(job if job is not None else submit(i))}
            pending[i + 1] = submit(i + 1)
            if ds.attrs is not None:
                batch["attr"] = np.stack([ds.attrs[ds.files[j]] for j in idx])
        else:
            results = list(pool.map(ds.get, idx))
            batch = {"image": np.stack([r[0] for r in results])}
            if results[0][1] is not None:
                batch["attr"] = np.stack([r[1] for r in results])
        return batch

    return IndexedBatches(batch_at)
