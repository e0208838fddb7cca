"""Tests: grain pipeline wrapper, imagenet npz loader, distributed env
detection, optimizer schedules."""

import os

import numpy as np
import pytest

from pytorch_glow_tpu.config import DataConfig, GlowConfig, OptimConfig, TrainConfig
from pytorch_glow_tpu.data.grain_pipeline import GRAIN_AVAILABLE, make_grain_loader
from pytorch_glow_tpu.data.pipeline import load_imagenet_npz, make_dataset
from pytorch_glow_tpu.parallel import distributed
from pytorch_glow_tpu.train.optim import make_schedule


@pytest.mark.skipif(not GRAIN_AVAILABLE, reason="grain not installed")
def test_grain_synthetic_loader():
    loader = make_grain_loader(
        DataConfig(name="synthetic"),
        GlowConfig(image_shape=(8, 8, 3)),
        TrainConfig(batch_size=16, seed=0),
    )
    assert loader is not None
    it = iter(loader)
    b = next(it)
    assert b["image"].shape == (16, 8, 8, 3) and b["image"].dtype == np.uint8
    b2 = next(it)
    assert not np.array_equal(b["image"], b2["image"])


@pytest.mark.skipif(not GRAIN_AVAILABLE, reason="grain not installed")
def test_grain_cifar_missing_returns_none(tmp_path):
    loader = make_grain_loader(
        DataConfig(name="cifar10", root=str(tmp_path)),
        GlowConfig(image_shape=(32, 32, 3)),
        TrainConfig(batch_size=4),
    )
    assert loader is None


def test_imagenet_npz_loader(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.integers(0, 256, (10, 3 * 8 * 8), dtype=np.uint8)
    labels = rng.integers(1, 1001, (10,))
    np.savez(tmp_path / "train_data_batch_1.npz", data=data, labels=labels)
    imgs, labs = load_imagenet_npz(str(tmp_path), 8, "train")
    assert imgs.shape == (10, 8, 8, 3) and labs.min() >= 0
    np.testing.assert_array_equal(labs, labels - 1)
    # CHW-flattened row-major: channel 0 first.
    np.testing.assert_array_equal(imgs[0, :, :, 0].ravel(), data[0][: 64])
    assert load_imagenet_npz(str(tmp_path), 8, "val") is None


def test_make_dataset_falls_back_to_synthetic(tmp_path, capsys):
    it = make_dataset(
        DataConfig(name="cifar10", root=str(tmp_path)),
        GlowConfig(image_shape=(32, 32, 3)),
        TrainConfig(batch_size=4),
    )
    b = next(it)
    assert b["image"].shape == (4, 32, 32, 3)
    assert "using synthetic data" in capsys.readouterr().out


def test_multihost_env_detection(monkeypatch):
    for k in ("JAX_COORDINATOR_ADDRESS", "COORDINATOR_ADDRESS",
              "MEGASCALE_COORDINATOR_ADDRESS", "TPU_WORKER_HOSTNAMES",
              "GLOW_TPU_MULTIHOST"):
        monkeypatch.delenv(k, raising=False)
    assert not distributed.multihost_env()
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert not distributed.multihost_env()  # single worker != multihost
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    assert distributed.multihost_env()
    monkeypatch.setenv("GLOW_TPU_MULTIHOST", "off")
    assert not distributed.multihost_env()
    monkeypatch.setenv("GLOW_TPU_MULTIHOST", "auto")
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "")
    monkeypatch.setenv("JAX_COORDINATOR_ADDRESS", "1.2.3.4:1234")
    assert distributed.multihost_env()


def test_schedules():
    import jax.numpy as jnp

    warm = make_schedule(OptimConfig(lr=1e-3, schedule="warmup", warmup_steps=100))
    assert float(warm(0)) == pytest.approx(1e-5)
    assert float(warm(99)) == pytest.approx(1e-3)
    assert float(warm(5000)) == pytest.approx(1e-3)

    const = make_schedule(OptimConfig(lr=2e-4, schedule="constant"))
    assert float(const(123)) == pytest.approx(2e-4)

    noam = make_schedule(OptimConfig(lr=1e-3, schedule="noam", warmup_steps=100))
    peak_region = float(noam(jnp.asarray(99.0)))
    late = float(noam(jnp.asarray(10000.0)))
    assert peak_region > late  # decays after warmup
    assert float(noam(jnp.asarray(0.0))) < peak_region  # ramps up
