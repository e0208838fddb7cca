"""Generic image-folder dataset (data/folder.py): torchvision-style class
subdirectories -> labels, flat folders -> unlabeled, shared batching engine
(native decode / PIL fallback), split discipline, O(1) resume, grain source,
and the label -> one-hot flow through a real y-conditional train run.

Reference counterpart: none (upstream ships only the CelebA folder dataset,
SURVEY.md §2.1 #4); the lineage's LSUN-category workflow is the use case.
"""

import os

import numpy as np
import pytest

from pytorch_glow_tpu.config import (
    DataConfig, GlowConfig, OptimConfig, Profile, TrainConfig,
)
from pytorch_glow_tpu.data.folder import ImageFolder, image_folder_batches
from pytorch_glow_tpu.data.pipeline import make_dataset

SIZE = 16


def _write_png(path: str, value: int) -> None:
    from PIL import Image

    # Constant-valued square image: survives crop/resize/decode exactly, so
    # every pixel identifies the source file.
    arr = np.full((SIZE, SIZE, 3), value, np.uint8)
    Image.fromarray(arr).save(path)


@pytest.fixture
def class_tree(tmp_path):
    """root/{ants,bees}/imgNN.png — value = global id (ants 0..23, bees 100..123)."""
    for ci, cls in enumerate(("ants", "bees")):
        d = tmp_path / cls
        d.mkdir()
        for i in range(24):
            _write_png(str(d / f"img{i:02d}.png"), ci * 100 + i)
    return str(tmp_path)


@pytest.fixture
def flat_tree(tmp_path):
    for i in range(24):
        _write_png(str(tmp_path / f"img{i:02d}.png"), i)
    return str(tmp_path)


def test_image_folder_layout_and_split(class_tree):
    tr = ImageFolder(class_tree, SIZE, "train")
    te = ImageFolder(class_tree, SIZE, "test")
    assert tr.class_names == ["ants", "bees"]  # sorted subdir order
    # last-5% (=1 of 24) holdout per class, train/test disjoint
    assert len(tr) == 46 and len(te) == 2
    assert set(tr.files).isdisjoint(te.files)
    assert te.labels is not None and sorted(te.labels.tolist()) == [0, 1]
    img, label = tr.get(0)
    assert img.shape == (SIZE, SIZE, 3) and img.dtype == np.uint8
    assert int(img[0, 0, 0]) // 100 == int(label)


def test_image_folder_batches_labels_match_images(class_tree):
    data_cfg = DataConfig(name="image_folder", root=class_tree,
                          image_size=SIZE, loader="native")
    glow_cfg = GlowConfig(image_shape=(SIZE, SIZE, 3))
    train_cfg = TrainConfig(batch_size=8, seed=3)
    it = make_dataset(data_cfg, glow_cfg, train_cfg)
    seen = set()
    for _ in range(5):
        b = next(it)
        assert b["image"].shape == (8, SIZE, SIZE, 3)
        vals = b["image"][:, 0, 0, 0].astype(int)
        np.testing.assert_array_equal(vals // 100, b["label"]
                                      ), (vals, b["label"])
        seen.update(vals.tolist())
    assert len(seen) > 20  # shuffling actually mixes both classes

    # O(1) index-state resume: fresh iterator at the saved state replays.
    state = it.get_state()
    want = next(it)
    it2 = make_dataset(data_cfg, glow_cfg, train_cfg)
    it2.set_state(state)
    got = next(it2)
    np.testing.assert_array_equal(got["image"], want["image"])
    np.testing.assert_array_equal(got["label"], want["label"])


def test_flat_folder_is_unlabeled(flat_tree):
    data_cfg = DataConfig(name="image_folder", root=flat_tree,
                          image_size=SIZE, loader="native")
    it = make_dataset(data_cfg, GlowConfig(image_shape=(SIZE, SIZE, 3)),
                      TrainConfig(batch_size=4, seed=0))
    b = next(it)
    assert "label" not in b and "attr" not in b
    assert b["image"].shape == (4, SIZE, SIZE, 3)


def test_image_folder_grain_source(class_tree):
    data_cfg = DataConfig(name="image_folder", root=class_tree,
                          image_size=SIZE, loader="grain")
    it = make_dataset(data_cfg, GlowConfig(image_shape=(SIZE, SIZE, 3)),
                      TrainConfig(batch_size=8, seed=1))
    b = next(it)
    assert b["image"].shape == (8, SIZE, SIZE, 3)
    vals = np.asarray(b["image"])[:, 0, 0, 0].astype(int)
    np.testing.assert_array_equal(vals // 100, np.asarray(b["label"]))


def test_image_folder_y_conditional_train(class_tree, tmp_path):
    """Class labels drive the y-conditional objective end to end."""
    from pytorch_glow_tpu.train import builder as builderlib
    from pytorch_glow_tpu.train import trainer as trainerlib

    p = Profile(
        name="imgfolder",
        glow=GlowConfig(image_shape=(SIZE, SIZE, 3), hidden_channels=16,
                        K=2, L=2, y_condition=True, y_classes=2),
        optim=OptimConfig(lr=1e-3, warmup_steps=4),
        train=TrainConfig(batch_size=8, num_steps=3, scalar_log_gap=2,
                          plot_gap=0, checkpoint_gap=0, eval_gap=0, seed=0),
        data=DataConfig(name="image_folder", root=class_tree,
                        image_size=SIZE, loader="native"),
        out_dir=str(tmp_path / "out"),
    )
    built = builderlib.build(p)
    result = trainerlib.train(built, quiet=True)
    assert np.isfinite(result["loss"])
