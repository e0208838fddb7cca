"""Tests for observability utilities: CSV schema growth, image grids,
throughput meter, param partitioning edge cases."""

import os
import time

import numpy as np
import pytest

from pytorch_glow_tpu.utils.image import make_grid, save_image_grid
from pytorch_glow_tpu.utils.metrics import CsvWriter, Throughput
from pytorch_glow_tpu.utils.tree import merge, partition


def test_csv_writer_schema_growth(tmp_path):
    path = str(tmp_path / "m.csv")
    w = CsvWriter(path)
    w.scalars(10, {"loss": 1.5})
    w.scalars(20, {"loss": 1.2, "eval_nll": 3.3})  # late new column
    w.scalars(30, {"loss": 1.1})
    rows = open(path).read().splitlines()
    assert rows[0] == "step,loss,eval_nll"
    assert rows[1].startswith("10,1.5") and rows[1].endswith(",")
    assert "3.3" in rows[2]

    # Reopening appends and keeps history.
    w2 = CsvWriter(path)
    w2.scalars(40, {"loss": 1.0})
    rows = open(path).read().splitlines()
    assert len(rows) == 5 and rows[-1].startswith("40,")


def test_make_grid_layout():
    imgs = np.arange(4 * 2 * 3 * 3, dtype=np.uint8).reshape(4, 2, 3, 3)
    grid = make_grid(imgs, ncol=2, pad=1)
    # 2 rows x 2 cols of 2x3 images with 1px padding.
    assert grid.shape == (2 * (2 + 1) + 1, 2 * (3 + 1) + 1, 3)
    np.testing.assert_array_equal(grid[1:3, 1:4], imgs[0])
    np.testing.assert_array_equal(grid[1:3, 5:8], imgs[1])


def test_save_image_grid(tmp_path):
    path = str(tmp_path / "g" / "grid.png")
    save_image_grid(path, np.zeros((3, 4, 4, 3), np.uint8))
    assert os.path.getsize(path) > 0


def test_throughput_meter():
    t = Throughput(batch_size=10)
    t.update(5)
    time.sleep(0.05)
    rate = t.rate_and_reset()
    assert 0 < rate < 50 / 0.04
    t.update(1)
    t.reset_clock()
    assert t._steps == 0


def test_partition_merge_roundtrip():
    import jax.numpy as jnp

    tree = {
        "a": jnp.ones((2,)),
        "idx": jnp.arange(3),  # int -> frozen
        "nested": {"sign_s": jnp.ones((2,)), "w": jnp.zeros((2, 2))},
    }
    trainable, frozen = partition(tree)
    assert trainable["idx"] is None and frozen["idx"] is not None
    assert trainable["nested"]["sign_s"] is None  # frozen by name
    assert frozen["nested"]["w"] is None
    merged = merge(trainable, frozen)
    for path_val, orig in zip(
        sorted(str(k) for k in merged), sorted(str(k) for k in tree)
    ):
        assert path_val == orig
    np.testing.assert_array_equal(np.asarray(merged["idx"]), np.arange(3))
