"""AOT serving artifacts (pytorch_glow_tpu/serve.py): export -> load ->
serve must reproduce the live model exactly, without model code or
checkpoints at serve time.  The reference has no AOT serving surface
(its Inferer re-traces live torch modules per process; SURVEY.md §3.2);
jax.export is the TPU-native production path."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pytorch_glow_tpu import serve
from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.models import glow

B = 4


@pytest.fixture(scope="module")
def tiny():
    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2)
    params = glow.init_glow(jax.random.key(0), cfg)
    return params, cfg


@pytest.fixture(scope="module")
def artifact(tiny, tmp_path_factory):
    params, cfg = tiny
    out = str(tmp_path_factory.mktemp("artifact"))
    manifest = serve.export_artifact(params, cfg, out, batch_size=B)
    return out, manifest


def _images():
    return np.random.default_rng(7).integers(0, 256, (B, 8, 8, 3), dtype=np.uint8)


def test_manifest(artifact):
    out, manifest = artifact
    on_disk = json.load(open(os.path.join(out, "manifest.json")))
    assert on_disk == manifest
    assert manifest["batch_size"] == B
    assert set(manifest["functions"]) == {
        "sample", "encode", "decode", "reconstruct", "nll", "nll_elbo"}
    for name, meta in manifest["functions"].items():
        blob = os.path.join(out, f"{name}.jaxexport")
        assert os.path.getsize(blob) == meta["bytes"] > 0


def test_served_sample_bitwise_matches_live(tiny, artifact):
    params, cfg = tiny
    m = serve.load_artifact(artifact[0])
    got = m.sample(seed=7, temperature=0.5)
    want = np.asarray(glow.postprocess(
        glow.sample(params, jax.random.key(jnp.uint32(7)), cfg, n=B,
                    temperature=jnp.float32(0.5)), cfg))
    assert got.dtype == np.uint8 and (got == want).all()
    # different seeds -> different draws
    assert (m.sample(seed=8, temperature=0.5) != got).any()


def test_served_encode_decode_nll_match_live(tiny, artifact):
    params, cfg = tiny
    m = serve.load_artifact(artifact[0])
    x = _images()
    z = m.encode(x)
    z_live = np.asarray(glow.encode(
        params, glow.preprocess(jnp.asarray(x), cfg), cfg)[0])
    np.testing.assert_array_equal(z, z_live)

    img = m.decode(z, seed=3, temperature=0.0)
    assert img.shape == x.shape and img.dtype == np.uint8

    nll = m.nll(x)
    nll_live = np.asarray(glow.log_prob(
        params, glow.preprocess(jnp.asarray(x), cfg), cfg)["nll"])
    np.testing.assert_allclose(nll, nll_live, rtol=1e-6)

    # The VALID 1-draw ELBO bound serves too: deterministic under a fixed
    # seed and matching the live glow.nll_bound with the same key.
    b1 = m.nll_elbo(x, seed=5)
    assert np.array_equal(b1, m.nll_elbo(x, seed=5))
    live = np.asarray(glow.nll_bound(
        params, glow.preprocess(jnp.asarray(x), cfg), cfg,
        jax.random.key(np.uint32(5)), samples=1, bound="elbo"))
    np.testing.assert_allclose(b1, live, rtol=1e-6)


def test_served_reconstruct_roundtrip(artifact):
    m = serve.load_artifact(artifact[0])
    x = _images()
    rec = m.reconstruct(x)
    # exact-latent round-trip; ±1 bin for floor-boundary pixels
    assert np.abs(rec.astype(int) - x.astype(int)).max() <= 1


def test_y_conditional_entry_points(tmp_path):
    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
                     y_condition=True, y_classes=5, y_multi_class=False)
    params = glow.init_glow(jax.random.key(1), cfg)
    # The class->prior projection is zero-initialized (training learns it);
    # perturb it so labels actually shift the prior in this untrained model.
    proj = params["top"]["project_ycond"]
    proj["w"] = jax.random.normal(jax.random.key(2), proj["w"].shape) * 0.5
    out = str(tmp_path / "artifact")
    man = serve.export_artifact(params, cfg, out, batch_size=B,
                                functions=("sample_y", "nll_y"))
    assert set(man["functions"]) == {"sample_y", "nll_y"}
    m = serve.load_artifact(out)
    a = m.sample(seed=0, temperature=0.6, labels=[0] * B)
    b = m.sample(seed=0, temperature=0.6, labels=[1] * B)
    assert a.shape == (B, 8, 8, 3) and (a != b).any()  # class shifts the prior
    nll = m.nll(_images(), labels=[2] * B)
    assert nll.shape == (B,) and np.isfinite(nll).all()


def test_function_subset_and_unknown_name(tiny, tmp_path):
    params, cfg = tiny
    out = str(tmp_path / "sub")
    man = serve.export_artifact(params, cfg, out, batch_size=2,
                                functions=("sample",))
    assert list(man["functions"]) == ["sample"]
    m = serve.load_artifact(out)
    with pytest.raises(KeyError, match="encode"):
        m.encode(np.zeros((2, 8, 8, 3), np.uint8))
    with pytest.raises(ValueError, match="nope"):
        serve.export_artifact(params, cfg, out, functions=("nope",))


def test_multi_platform_export_forces_portable_path(tiny, tmp_path):
    # A pallas-configured model exports the portable XLA path by default,
    # so one artifact lowers for BOTH tpu and cpu from this host.
    params, cfg = tiny
    cfg = GlowConfig(**{**cfg.__dict__, "flowstep_impl": "pallas"})
    out = str(tmp_path / "xp")
    man = serve.export_artifact(params, cfg, out, batch_size=2,
                                functions=("sample",), platforms=("cpu", "tpu"))
    assert man["platforms"] == ["cpu", "tpu"]
    assert man["glow_config"]["flowstep_impl"] == "xla"
    assert serve.load_artifact(out).sample(0, 0.7).shape == (2, 8, 8, 3)


def test_sharded_export_serves_on_a_mesh(tiny, tmp_path):
    """SPMD serving artifact: batch sharded over an 8-device 'data' mesh;
    the loader rebuilds the mesh and re-places inputs itself."""
    from jax.sharding import Mesh

    params, cfg = tiny
    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    out = str(tmp_path / "spmd")
    man = serve.export_artifact(params, cfg, out, batch_size=16,
                                functions=("sample", "nll"), mesh=mesh)
    assert man["mesh"] == {"shape": [8], "axis_names": ["data"]}

    m = serve.load_artifact(out)
    x = np.random.default_rng(3).integers(0, 256, (16, 8, 8, 3), np.uint8)
    nll = m.nll(x)
    live = np.asarray(glow.log_prob(
        params, glow.preprocess(jnp.asarray(x), cfg), cfg)["nll"])
    np.testing.assert_allclose(nll, live, rtol=1e-5)
    assert m.sample(seed=5, temperature=0.7).shape == (16, 8, 8, 3)

    # batch must divide the data axis
    with pytest.raises(ValueError, match="divide"):
        serve.export_artifact(params, cfg, str(tmp_path / "bad"),
                              batch_size=3, functions=("sample",), mesh=mesh)


def test_dynamic_batch_artifact_serves_any_batch(tiny, tmp_path):
    """batch_size='dynamic' exports a symbolic batch dimension: one
    artifact serves every batch size."""
    params, cfg = tiny
    out = str(tmp_path / "dyn")
    man = serve.export_artifact(params, cfg, out, batch_size="dynamic",
                                functions=("sample", "nll", "encode"))
    assert man["batch_size"] == "dynamic"
    assert man["functions"]["nll"]["args"][0]["shape"] == ["b", 8, 8, 3]

    m = serve.load_artifact(out)
    for n in (1, 3, 8):
        assert m.sample(seed=1, temperature=0.7, n=n).shape == (n, 8, 8, 3)
        x = np.random.default_rng(n).integers(0, 256, (n, 8, 8, 3), np.uint8)
        nll = m.nll(x)
        live = np.asarray(glow.log_prob(
            params, glow.preprocess(jnp.asarray(x), cfg), cfg)["nll"])
        np.testing.assert_allclose(nll, live, rtol=1e-5)

    # dynamic + mesh is rejected (shardings need a concrete batch)
    from jax.sharding import Mesh

    mesh = Mesh(np.asarray(jax.devices()[:8]).reshape(8), ("data",))
    with pytest.raises(ValueError, match="dynamic"):
        serve.export_artifact(params, cfg, str(tmp_path / "bad"),
                              batch_size="dynamic", mesh=mesh)


def test_newer_format_rejected(artifact, tmp_path):
    import shutil

    out = str(tmp_path / "newer")
    shutil.copytree(artifact[0], out)
    man = json.load(open(os.path.join(out, "manifest.json")))
    man["format_version"] = serve.FORMAT_VERSION + 1
    json.dump(man, open(os.path.join(out, "manifest.json"), "w"))
    with pytest.raises(ValueError, match="newer"):
        serve.load_artifact(out)
