"""Torch-snapshot migration (utils/torch_migrate.py, scripts/torch_migrate.py).

The contract: a reference-lineage PyTorch snapshot imports into our pytree
losslessly (and back), so a user of the reference switches frameworks
without retraining (SURVEY.md §2.1 #6/#18 snapshot format)."""

import json
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))

from pytorch_glow_tpu.config import GlowConfig  # noqa: E402
from pytorch_glow_tpu.models import glow  # noqa: E402
from pytorch_glow_tpu.utils import torch_migrate as tm  # noqa: E402

CONFIGS = {
    "lu-affine": GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2),
    "plain-additive": GlowConfig(
        image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
        lu_decomposed=False, flow_coupling="additive",
    ),
    "shuffle-ycond": GlowConfig(
        image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2,
        flow_permutation="shuffle", y_condition=True, y_classes=10,
    ),
    "reverse-nolearntop": GlowConfig(
        image_shape=(8, 8, 3), hidden_channels=16, K=2, L=3,
        flow_permutation="reverse", flow_coupling="additive", learn_top=False,
    ),
}


def _randomized_params(cfg, seed=0):
    """init_glow with every float leaf perturbed (so zeros can't hide a
    mapping bug), DDI'd actnorms included."""
    params = glow.init_glow(jax.random.key(seed), cfg)
    x = jax.random.uniform(jax.random.key(seed + 1), (4, *cfg.image_shape))
    params = glow.ddi_init(params, x, cfg)
    rng = np.random.default_rng(seed)

    def perturb(path, leaf):
        a = np.asarray(leaf)
        if not np.issubdtype(a.dtype, np.floating):
            return leaf
        a = a + rng.normal(0, 0.02, a.shape).astype(a.dtype)
        # l_raw/u_raw stay strictly triangular under training (lu_assemble
        # masks them, so their gradients outside the mask are zero) — keep
        # the perturbation on that manifold.
        key = jax.tree_util.keystr(path)
        if key.endswith(".l_raw"):
            a = np.tril(a, -1)
        elif key.endswith(".u_raw"):
            a = np.triu(a, 1)
        return jnp.asarray(a)

    return jax.tree_util.tree_map_with_path(perturb, params)


@pytest.mark.parametrize("name", list(CONFIGS))
def test_export_import_roundtrip_bitwise(name):
    cfg = CONFIGS[name]
    params = _randomized_params(cfg)
    sd = tm.export_state_dict(params, cfg)
    back = tm.import_state_dict(sd, cfg)
    assert jax.tree.structure(back) == jax.tree.structure(params)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b)), jax.tree_util.keystr(path)


def test_export_uses_lineage_naming_and_layout():
    cfg = CONFIGS["lu-affine"]
    sd = tm.export_state_dict(_randomized_params(cfg), cfg)
    # Layer 0 is the paramless Squeeze; steps start at 1.
    c = 12  # 3 channels squeezed once
    assert sd["flow.layers.1.actnorm.bias"].shape == (1, c, 1, 1)
    assert sd["flow.layers.1.invconv.p"].shape == (c, c)
    assert sd["flow.layers.1.invconv.log_s"].shape == (c,)
    # torch conv weights are (out, in, kh, kw):
    assert sd["flow.layers.1.f.0.weight"].shape == (16, c // 2, 3, 3)
    assert sd["flow.layers.1.f.2.weight"].shape == (16, 16, 1, 1)
    assert sd["flow.layers.1.f.4.weight"].shape == (c, 16, 3, 3)
    assert sd["flow.layers.1.f.4.logs"].shape == (c, 1, 1)
    # After K=2 steps: layer 3 is the Split2d, then layer 4 the next Squeeze.
    assert sd["flow.layers.3.conv.weight"].shape == (c, c // 2, 3, 3)
    assert not any(k.startswith("flow.layers.0.") for k in sd)
    assert not any(k.startswith("flow.layers.4.") for k in sd)
    assert sd["learn_top.weight"].shape == (48, 48, 3, 3)
    # The strictly-triangular invariants the lineage's masks enforce:
    low = sd["flow.layers.1.invconv.lower"]
    assert np.array_equal(low, np.tril(low, -1))
    up = sd["flow.layers.1.invconv.upper"]
    assert np.array_equal(up, np.triu(up, 1))


def test_ycond_linear_layout():
    cfg = CONFIGS["shuffle-ycond"]
    sd = tm.export_state_dict(_randomized_params(cfg), cfg)
    c_final = cfg.final_latent_shape[-1]
    assert sd["project_ycond.weight"].shape == (2 * c_final, 10)  # (out, in)
    assert sd["project_class.weight"].shape == (10, c_final)
    back = tm.import_state_dict(sd, cfg)
    x = jax.random.uniform(jax.random.key(3), (2, *cfg.image_shape))
    y = jax.nn.one_hot(jnp.array([1, 7]), 10)
    p0 = _randomized_params(cfg)
    # different params -> different nll (sanity that the check below has teeth)
    nll0 = glow.log_prob(p0, x, cfg, y_onehot=y)["nll"]
    nll1 = glow.log_prob(back, x, cfg, y_onehot=y)["nll"]
    assert np.array_equal(np.asarray(nll0), np.asarray(nll1))


def test_torch_file_roundtrip_preserves_nll(tmp_path):
    """Full .pth round-trip (torch.save/load at the IO edge): the imported
    model computes the bit-identical NLL."""
    cfg = CONFIGS["plain-additive"]
    params = _randomized_params(cfg, seed=5)
    path = str(tmp_path / "snap.pth")
    tm.save_torch_snapshot(path, params, cfg, step=123)
    sd, step = tm.load_torch_snapshot(path)
    assert step == 123
    back = tm.import_state_dict(sd, cfg)
    x = jax.random.uniform(jax.random.key(9), (2, *cfg.image_shape))
    nll_a = glow.log_prob(params, x, cfg)["nll"]
    nll_b = glow.log_prob(back, x, cfg)["nll"]
    assert np.array_equal(np.asarray(nll_a), np.asarray(nll_b))


def test_import_into_variational_config_seeds_uniform_vardeq(tmp_path):
    """A lineage snapshot (trained with uniform dequant) imports into a
    dequant="variational" config: the fresh zero-init vardeq IS uniform, so
    the noise-free objective is unchanged and training can only improve."""
    cfg = CONFIGS["lu-affine"]
    params = _randomized_params(cfg, seed=7)
    sd = tm.export_state_dict(params, cfg)
    import dataclasses

    vcfg = dataclasses.replace(
        cfg, dequant="variational", vardeq_steps=2, vardeq_width=8,
        vardeq_context_width=8,
    )
    back = tm.import_state_dict(sd, vcfg)
    assert "vardeq" in back
    x = jax.random.uniform(jax.random.key(2), (2, *cfg.image_shape))
    nll_a = glow.log_prob(params, x, cfg)["nll"]
    nll_b = glow.log_prob(back, x, vcfg)["nll"]
    assert np.array_equal(np.asarray(nll_a), np.asarray(nll_b))
    out = glow.log_prob(back, x, vcfg, rng=jax.random.key(4))
    assert np.all(np.asarray(out["neg_log_q"]) == 0.0)  # exactly uniform at init


def test_import_rejects_mismatched_config():
    cfg = CONFIGS["lu-affine"]
    sd = tm.export_state_dict(_randomized_params(cfg), cfg)
    import dataclasses

    with pytest.raises(ValueError, match="param-bearing flow layers"):
        tm.import_state_dict(sd, dataclasses.replace(cfg, K=3))


def test_import_strips_dataparallel_prefix_and_renames():
    cfg = CONFIGS["lu-affine"]
    params = _randomized_params(cfg, seed=11)
    sd = tm.export_state_dict(params, cfg)
    mangled = {"module." + k.replace("flow.", "flownet."): v for k, v in sd.items()}
    back = tm.import_state_dict(mangled, cfg, rename={"flownet.": "flow."})
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(params),
        jax.tree_util.tree_leaves_with_path(back),
    ):
        assert np.array_equal(np.asarray(a), np.asarray(b)), jax.tree_util.keystr(path)


def test_cli_import_export_e2e(tmp_path, capsys):
    """Train a tiny model -> export to .pth -> import into a fresh results
    dir -> both checkpoints report the identical noise-free NLL through the
    real CLIs."""
    import infer as infer_cli
    import train as train_cli
    import torch_migrate as cli

    out_a = str(tmp_path / "a")
    out_b = str(tmp_path / "b")
    prof_path = str(tmp_path / "p.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "mig",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                          "K": 2, "L": 2},
                "train": {"batch_size": 8, "num_steps": 4, "scalar_log_gap": 4,
                           "plot_gap": 0, "checkpoint_gap": 2,
                           "num_sample_images": 4},
                "data": {"name": "synthetic", "image_size": 8},
            },
            f,
        )
    r = train_cli.main([prof_path, "--out-dir", out_a, "--quiet"])
    assert r["final_step"] == 4

    pth = str(tmp_path / "glow.pth")
    cli.main(["export", prof_path, "--out-dir", out_a, "-o", pth])
    assert os.path.getsize(pth) > 0
    assert "exported step-4" in capsys.readouterr().out

    cli.main(["import", pth, prof_path, "--out-dir", out_b])
    assert "optimizer state fresh" in capsys.readouterr().out

    infer_cli.main(["nll", prof_path, "--synthetic", "--out-dir", out_a,
                    "--batches", "1"])
    nll_a = capsys.readouterr().out
    infer_cli.main(["nll", prof_path, "--synthetic", "--out-dir", out_b,
                    "--batches", "1"])
    nll_b = capsys.readouterr().out
    assert "bits/dim" in nll_a and nll_a == nll_b


def test_cli_export_ema_params(tmp_path, capsys):
    """--ema exports the Polyak-averaged trainables, not the live params."""
    import numpy as np
    import train as train_cli
    import torch_migrate as cli

    out = str(tmp_path / "out")
    prof_path = str(tmp_path / "p.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "ema",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                          "K": 2, "L": 2},
                "train": {"batch_size": 8, "num_steps": 4, "scalar_log_gap": 4,
                           "plot_gap": 0, "checkpoint_gap": 2,
                           "num_sample_images": 4, "ema_decay": 0.5},
                "data": {"name": "synthetic", "image_size": 8},
            },
            f,
        )
    train_cli.main([prof_path, "--out-dir", out, "--quiet"])

    live_pth = str(tmp_path / "live.pth")
    ema_pth = str(tmp_path / "ema.pth")
    cli.main(["export", prof_path, "--out-dir", out, "-o", live_pth])
    cli.main(["export", prof_path, "--out-dir", out, "-o", ema_pth, "--ema"])
    capsys.readouterr()

    sd_live, _ = tm.load_torch_snapshot(live_pth)
    sd_ema, _ = tm.load_torch_snapshot(ema_pth)
    assert sd_live.keys() == sd_ema.keys()
    # EMA trainables differ from live after 4 steps of decay-0.5 averaging:
    diffs = [
        k for k in sd_live
        if not np.array_equal(sd_live[k].numpy(), sd_ema[k].numpy())
    ]
    assert diffs, "EMA export identical to live params"
