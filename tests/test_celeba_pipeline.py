"""CelebA folder pipeline end-to-end on a synthetic on-disk dataset:
attr file parsing, native/PIL decode paths, batching (SURVEY.md §2.1 #4)."""

import os

import numpy as np
import pytest
from PIL import Image

from pytorch_glow_tpu.config import DataConfig, GlowConfig, TrainConfig
from pytorch_glow_tpu.data.celeba import celeba_batches, parse_attr_file


@pytest.fixture(scope="module")
def celeba_dir(tmp_path_factory):
    root = tmp_path_factory.mktemp("celeba_root")
    img_dir = root / "img_align_celeba"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = [f"{i:06d}.jpg" for i in range(1, 13)]
    for nme in names:
        arr = rng.integers(0, 256, (38, 32, 3), dtype=np.uint8)
        Image.fromarray(arr).save(img_dir / nme, quality=95)
    attrs = rng.choice([-1, 1], size=(len(names), 40))
    attr_names = [f"Attr_{i}" for i in range(40)]
    lines = [str(len(names)), " ".join(attr_names)]
    for nme, row in zip(names, attrs):
        lines.append(nme + " " + " ".join(str(v) for v in row))
    (root / "list_attr_celeba.txt").write_text("\n".join(lines) + "\n")
    return str(root), names, attrs


def test_parse_attr_file(celeba_dir):
    root, names, attrs = celeba_dir
    files, table, attr_names = parse_attr_file(os.path.join(root, "list_attr_celeba.txt"))
    assert files == names and len(attr_names) == 40
    np.testing.assert_array_equal(table[names[3]], attrs[3])


def test_batches_shape_and_attrs(celeba_dir):
    root, names, attrs = celeba_dir
    it = celeba_batches(
        DataConfig(name="celeba", root=root, image_size=16, num_workers=2),
        GlowConfig(image_shape=(16, 16, 3)),
        TrainConfig(batch_size=4, seed=0),
    )
    assert it is not None
    b = next(it)
    assert b["image"].shape == (4, 16, 16, 3) and b["image"].dtype == np.uint8
    assert b["attr"].shape == (4, 40)
    assert b["image"].std() > 0  # actually decoded something


def test_returns_none_when_missing(tmp_path):
    it = celeba_batches(
        DataConfig(name="celeba", root=str(tmp_path / "nope"), image_size=16),
        GlowConfig(image_shape=(16, 16, 3)),
        TrainConfig(batch_size=4),
    )
    assert it is None
