"""Inferer tests: encode/decode, attribute delta, manipulation, interpolation
(reference surface: upstream:network/inferer.py; SURVEY.md §2.1 #20)."""

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.inference import Inferer
from pytorch_glow_tpu.models import glow

CFG = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2)


def _inferer():
    params = glow.init_glow(jax.random.key(0), CFG)
    x = jax.random.uniform(jax.random.key(1), (16, 8, 8, 3))
    params = glow.ddi_init(params, x, CFG)
    return Inferer(params, CFG)


def test_class_label_delta_matches_onehot_attrs(tmp_path):
    """Labeled batches (image_folder class subdirs) produce the identical
    delta as the equivalent one-vs-rest ±1 attribute encoding, and an
    out-of-range label is rejected with the num_classes hint."""
    import pytest

    inf = _inferer()
    rng = np.random.default_rng(7)
    images = rng.integers(0, 256, (4, 8, 8, 8, 3), dtype=np.uint8)
    labels = rng.integers(0, 3, size=(4, 8))

    by_label = inf.compute_attribute_delta(
        ({"image": im, "label": lab} for im, lab in zip(images, labels)),
        num_classes=3,
    )
    onehot = (np.eye(3)[labels] * 2 - 1).astype(np.int8)  # ±1 one-vs-rest
    by_attr = inf.compute_attribute_delta(
        ({"image": im, "attr": a} for im, a in zip(images, onehot))
    )
    assert by_label.shape == (3, *CFG.final_latent_shape)
    np.testing.assert_array_equal(by_label, by_attr)

    with pytest.raises(ValueError, match="num_classes"):
        inf.compute_attribute_delta(
            iter([{"image": images[0], "label": labels[0]}]), num_classes=2
        )


def test_full_roundtrip_is_exact():
    inf = _inferer()
    imgs = np.random.default_rng(0).integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    rec = inf.reconstruct(imgs)
    # uint8-exact up to one quantization bin at bin edges.
    assert np.abs(imgs.astype(int) - rec.astype(int)).max() <= 1


def test_decode_temperature_zero_deterministic():
    inf = _inferer()
    imgs = np.random.default_rng(1).integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    z = inf.encode(imgs)
    a = inf.decode(z, temperature=0.0)
    b = inf.decode(z, temperature=0.0)
    np.testing.assert_array_equal(a, b)


def test_attribute_delta_and_manipulate(tmp_path):
    inf = _inferer()
    rng = np.random.default_rng(2)

    def batches():
        for _ in range(4):
            yield {
                "image": rng.integers(0, 256, (8, 8, 8, 3), dtype=np.uint8),
                "attr": rng.choice([-1, 1], size=(8, 5)).astype(np.int8),
            }

    delta = inf.compute_attribute_delta(batches())
    assert delta.shape == (5, *CFG.final_latent_shape)
    assert np.isfinite(delta).all()

    path = str(tmp_path / "delta.npz")
    Inferer.save_attribute_delta(path, delta, names=[f"a{i}" for i in range(5)])
    loaded = Inferer.load_attribute_delta(path)
    np.testing.assert_array_equal(loaded, delta)

    imgs = rng.integers(0, 256, (2, 8, 8, 3), dtype=np.uint8)
    out = inf.manipulate(imgs, delta, attr_idx=3, strength=1.5)
    assert out.shape == imgs.shape and out.dtype == np.uint8
    # strength 0 => decode(encode(x)) at T=0 (no-op manipulation).
    z = inf.encode(imgs)
    np.testing.assert_array_equal(
        np.asarray(inf.apply_attribute_delta(z, delta, 3, 0.0)), np.asarray(z)
    )


def test_interpolate_endpoints():
    inf = _inferer()
    rng = np.random.default_rng(3)
    a = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    seq = inf.interpolate(a, b, steps=5)
    assert seq.shape == (5, 8, 8, 3)
    assert np.isfinite(seq).all()


def test_interpolate_full_endpoints_exact():
    """Full-latent interpolation endpoints == the exact reconstructions."""
    inf = _inferer()
    rng = np.random.default_rng(5)
    a = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    b = rng.integers(0, 256, (8, 8, 3), dtype=np.uint8)
    seq = inf.interpolate_full(a, b, steps=4)
    assert seq.shape == (4, 8, 8, 3)

    def max_u8_err(x, y):
        return int(np.abs(x.astype(np.int16) - y.astype(np.int16)).max())

    # Endpoints == the inputs to within one uint8 quantization bin (the same
    # bound as the trainer's continuous recon_err_max_u8 drift guard; float
    # round-trip error can flip a pixel sitting exactly on a bin boundary).
    assert max_u8_err(seq[0], a) <= 1
    assert max_u8_err(seq[-1], b) <= 1
    rec_a = inf.reconstruct(a[None])[0]
    assert max_u8_err(rec_a, a) <= 1


def test_nll_matches_log_prob():
    inf = _inferer()
    imgs = np.random.default_rng(4).integers(0, 256, (4, 8, 8, 3), dtype=np.uint8)
    nll = inf.nll(imgs)
    x = glow.preprocess(jnp.asarray(imgs), CFG)
    expected = glow.log_prob(inf.params, x, CFG)["nll"]
    np.testing.assert_allclose(nll, np.asarray(expected), rtol=1e-5)
