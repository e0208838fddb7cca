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


def _fake_cifar10(root, n_per_file=24):
    """Write tiny CIFAR-10-format pickle batches under root."""
    import pickle

    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    for name in [f"data_batch_{i}" for i in range(1, 6)] + ["test_batch"]:
        entry = {
            b"data": rng.integers(0, 256, (n_per_file, 3 * 32 * 32), dtype=np.uint8),
            b"labels": rng.integers(0, 10, (n_per_file,)).tolist(),
        }
        with open(os.path.join(root, name), "wb") as f:
            pickle.dump(entry, f)


def test_indexed_iterator_state_resume():
    """get_state/set_state restore the exact stream position in O(1)."""
    from pytorch_glow_tpu.data.pipeline import synthetic_batches

    it = synthetic_batches(4, (8, 8, 3), y_classes=5, seed=9)
    for _ in range(7):
        next(it)
    state = it.get_state()
    want = next(it)

    it2 = synthetic_batches(4, (8, 8, 3), y_classes=5, seed=9)
    it2.set_state(state)
    got = next(it2)
    np.testing.assert_array_equal(got["image"], want["image"])
    np.testing.assert_array_equal(got["label"], want["label"])


def test_array_batches_midepoch_state(tmp_path):
    """Mid-epoch restore: the epoch permutation re-derives from (seed, epoch)
    so position k of epoch e is recovered without replay."""
    from pytorch_glow_tpu.data.pipeline import array_batches

    images = np.arange(40, dtype=np.uint8).reshape(40, 1, 1, 1) * np.ones(
        (1, 2, 2, 3), np.uint8
    )
    labels = np.arange(40)
    it = array_batches(images, labels, batch_size=8, seed=3)
    drawn = [next(it) for _ in range(7)]  # crosses into epoch 2 (5 bpe)
    state = it.get_state()
    want = next(it)

    it2 = array_batches(images, labels, batch_size=8, seed=3)
    it2.set_state(state)
    got = next(it2)
    np.testing.assert_array_equal(got["image"], want["image"])
    np.testing.assert_array_equal(got["label"], want["label"])
    # Epoch 1 covered all 40 examples exactly once.
    seen = np.concatenate([b["label"] for b in drawn[:5]])
    assert sorted(seen.tolist()) == list(range(40))


def test_make_dataset_dispatches_to_grain(tmp_path):
    """On-disk datasets route through the Grain production loader under
    loader='auto', and its iterator state checkpoints/restores."""
    from pytorch_glow_tpu.data.grain_pipeline import GrainIterator
    from pytorch_glow_tpu.data.pipeline import make_dataset

    _fake_cifar10(tmp_path)
    cfg = DataConfig(name="cifar10", root=str(tmp_path), loader="auto")
    it = make_dataset(cfg, GlowConfig(image_shape=(32, 32, 3)), TrainConfig(batch_size=8))
    assert isinstance(it, GrainIterator)
    for _ in range(3):
        next(it)
    state = it.get_state()
    want = next(it)

    it2 = make_dataset(cfg, GlowConfig(image_shape=(32, 32, 3)), TrainConfig(batch_size=8))
    it2.set_state(state)
    got = next(it2)
    np.testing.assert_array_equal(got["image"], want["image"])

    # loader="native" bypasses grain.
    it3 = make_dataset(
        DataConfig(name="cifar10", root=str(tmp_path), loader="native"),
        GlowConfig(image_shape=(32, 32, 3)),
        TrainConfig(batch_size=8),
    )
    assert not isinstance(it3, GrainIterator)
    assert next(it3)["image"].shape == (8, 32, 32, 3)


def test_process_rows_and_sharded_slicing(monkeypatch):
    """Multi-host: each process draws ITS rows of the identical global batch."""
    from pytorch_glow_tpu.data import pipeline as pl

    assert pl._process_rows(128, 0, 4) == (0, 32)
    assert pl._process_rows(128, 3, 4) == (96, 128)
    with pytest.raises(AssertionError):
        pl._process_rows(10, 0, 4)

    full = next(pl.synthetic_batches(8, (4, 4, 3), y_classes=3, seed=1))
    parts = []
    for pidx in range(2):
        monkeypatch.setattr(pl, "_proc_slice", lambda p=pidx: (p, 2))
        it = pl.synthetic_batches(8, (4, 4, 3), y_classes=3, seed=1)
        b = next(it)
        assert b["image"].shape[0] == 4
        parts.append(b)
    np.testing.assert_array_equal(
        np.concatenate([p["image"] for p in parts]), full["image"]
    )
    np.testing.assert_array_equal(
        np.concatenate([p["label"] for p in parts]), full["label"]
    )


def test_device_prefetch_state_accounts_for_queue():
    """Prefetch runs ahead of consumption; get_state must reflect CONSUMED
    batches only, so a restore hands back exactly the unconsumed stream."""
    from pytorch_glow_tpu.data.pipeline import device_prefetch, synthetic_batches

    src = synthetic_batches(2, (4, 4, 3), seed=11)
    pf = device_prefetch(src, size=4)
    for _ in range(3):
        next(pf)
    import time

    time.sleep(0.3)  # let the worker fill the queue well past the consumer
    state = pf.get_state()
    assert state == {"next_index": 3}
    want = next(pf)

    src2 = synthetic_batches(2, (4, 4, 3), seed=11)
    pf2 = device_prefetch(src2, size=4)
    pf2.set_state(state)
    got = next(pf2)
    np.testing.assert_array_equal(np.asarray(got["image"]), np.asarray(want["image"]))
    pf.close()
    pf2.close()


def test_device_prefetch_propagates_worker_errors():
    """An error in the producer thread must surface in the consumer with its
    original type — not as a silent end-of-stream."""
    from pytorch_glow_tpu.data.pipeline import device_prefetch

    def bad_source():
        yield {"image": np.zeros((2, 4, 4, 3), np.uint8)}
        raise ValueError("decode failed on record 7")

    it = device_prefetch(bad_source(), size=2)
    next(it)  # first batch is fine
    with pytest.raises(ValueError, match="decode failed on record 7"):
        next(it)


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


@pytest.mark.skipif(not GRAIN_AVAILABLE, reason="grain not installed")
def test_grain_worker_processes_and_state(tmp_path):
    """grain_workers > 0: decode runs in spawned worker PROCESSES, and the
    opaque iterator state still checkpoints/restores across a fresh pool."""
    from pytorch_glow_tpu.data.pipeline import make_dataset

    _fake_cifar10(tmp_path)
    cfg = DataConfig(name="cifar10", root=str(tmp_path), loader="grain",
                     grain_workers=2)
    it = make_dataset(cfg, GlowConfig(image_shape=(32, 32, 3)),
                      TrainConfig(batch_size=8))
    assert next(it)["image"].shape == (8, 32, 32, 3)
    state = it.get_state()
    want = next(it)

    it2 = make_dataset(cfg, GlowConfig(image_shape=(32, 32, 3)),
                       TrainConfig(batch_size=8))
    it2.set_state(state)
    np.testing.assert_array_equal(next(it2)["image"], want["image"])


def test_compile_cache_helper_respects_existing_config(monkeypatch):
    """enable_compile_cache must not clobber a user/test-configured cache
    (conftest sets jax_compilation_cache_dir for this suite), must honor
    GLOW_COMPILE_CACHE=0 and JAX_COMPILATION_CACHE_DIR."""
    from pytorch_glow_tpu.utils.compile_cache import enable_compile_cache

    # conftest already configured a cache dir -> helper is a no-op.
    assert enable_compile_cache() is None

    monkeypatch.setenv("GLOW_COMPILE_CACHE", "0")
    assert enable_compile_cache() is None
    monkeypatch.delenv("GLOW_COMPILE_CACHE")

    monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", "/tmp/somewhere")
    assert enable_compile_cache() is None


def test_compile_cache_fingerprint_keys_on_cpu_identity(monkeypatch, tmp_path):
    """The cache fingerprint must distinguish hosts by cpuid IDENTITY
    (family/model/stepping), not just the flags line: LLVM derives AOT
    tuning features (prefer-no-gather/scatter) from the model, so two
    hosts with identical flags can bake incompatible XLA:CPU executables
    (observed round 5 as cpu_aot_loader feature-mismatch warnings)."""
    from pytorch_glow_tpu.utils import compile_cache as cc

    flags = "flags\t\t: fpu vme de pse avx avx2 avx512f\n"
    a = tmp_path / "a.cpuinfo"
    a.write_text("vendor_id\t: GenuineIntel\ncpu family\t: 6\n"
                 "model\t\t: 85\nmodel name\t: Xeon A\nstepping\t: 4\n"
                 + flags + "\nprocessor\t: 1\nmodel\t\t: 99\n")
    b = tmp_path / "b.cpuinfo"
    b.write_text("vendor_id\t: GenuineIntel\ncpu family\t: 6\n"
                 "model\t\t: 106\nmodel name\t: Xeon B\nstepping\t: 6\n"
                 + flags + "\nprocessor\t: 1\nmodel\t\t: 99\n")

    monkeypatch.setattr(cc, "_CPUINFO", str(a))
    fa = cc._host_fingerprint()
    assert fa == cc._host_fingerprint()  # stable
    monkeypatch.setattr(cc, "_CPUINFO", str(b))
    fb = cc._host_fingerprint()
    assert fa != fb  # same flags, different model -> different cache dir
