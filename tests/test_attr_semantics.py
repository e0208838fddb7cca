"""Attribute manipulation PROVABLY works (round-4 verdict Next #5): train a
small Glow on the synthetic_attr family (three orthogonal, closed-form
measurable binary attributes — data/synth_attrs.py), compute one-vs-rest
latent deltas (reference semantics: upstream:network/inferer.py
compute_attribute_delta; SURVEY.md §2.1 #20), apply them, and assert with
the closed-form detectors that

  * the TARGET attribute's score moves monotonically with strength and
    reaches a large fraction of the population on/off gap at strength ±1,
  * the edit preserves non-target content: the OTHER attributes' detector
    scores move far less than the target's.

Real CelebA never reaches this box, so this is the offline proof that the
delta arithmetic produces a targeted semantic edit rather than just a valid
tensor.  Measured margins (seed-fixed, CPU): target |d(±1)| ≈ 0.53-0.86 of
the gap (threshold 0.35); worst cross-talk ratio ≈ 0.14 (threshold 0.40).
"""

import json
import subprocess
import sys

import numpy as np
import pytest

from pytorch_glow_tpu.data.synth_attrs import (
    ATTR_GAPS,
    ATTR_NAMES,
    attr_images,
    measure_attributes,
)

H = 8  # image side; disk radius 2 px at 8x8 — all three detectors valid
STEPS = 400


@pytest.fixture(scope="module")
def trained(tmp_path_factory):
    """One small Glow trained on synthetic_attr (~90 s CPU), shared by the
    API-level and report-CLI tests."""
    from pytorch_glow_tpu.inference import Inferer
    from pytorch_glow_tpu.train.builder import build
    from pytorch_glow_tpu.train.trainer import train
    from pytorch_glow_tpu.utils.profiles import profile_from_dict

    out = tmp_path_factory.mktemp("attr_sem")
    profile = profile_from_dict({
        "name": "attrsem",
        "glow": {"image_shape": [H, H, 3], "hidden_channels": 64,
                 "K": 4, "L": 2},
        "train": {"batch_size": 64, "num_steps": STEPS,
                  "scalar_log_gap": 200, "plot_gap": 0,
                  "checkpoint_gap": STEPS, "num_sample_images": 0},
        "data": {"name": "synthetic_attr"},
        "out_dir": str(out),
    })
    summary = train(build(profile))
    # The smooth-family base regime trains fast; ~4.8 bits/dim at 400 steps.
    # The bound only guards against a silently-broken run.
    assert summary["nll"] < 6.0
    b = build(profile, training=False, with_data=False)
    assert b.resumed
    return Inferer(b.state["params"], profile.glow), profile, out


def test_delta_moves_target_attribute_monotonically(trained):
    inferer, _, _ = trained
    rng = np.random.default_rng(123)

    def batches(n, bs=64):
        for _ in range(n):
            img, attrs = attr_images(rng, bs, H, H, 3)
            yield {"image": img, "attr": attrs}

    delta = inferer.compute_attribute_delta(batches(8))
    assert delta.shape[0] == 3 and np.isfinite(delta).all()

    held, _ = attr_images(np.random.default_rng(999), 32, H, H, 3)
    # Paired differencing against the strength-0 edit (decode(encode(x)) at
    # T=0) cancels the split-prior reconstruction offset AND any finite-
    # sample attribute correlation in the held-out batch.
    base = measure_attributes(inferer.manipulate(held, delta, 0, 0.0))
    strengths = (-1.0, -0.5, 0.5, 1.0)
    for ai, name in enumerate(ATTR_NAMES):
        d = {s: (measure_attributes(inferer.manipulate(held, delta, ai, s))
                 - base).mean(axis=0)
             for s in strengths}
        tgt = {s: d[s][ai] for s in strengths}
        # Monotone in strength, through zero.
        assert tgt[-1.0] < tgt[-0.5] < 0.0 < tgt[0.5] < tgt[1.0], (name, tgt)
        # Large fraction of the population on/off gap at strength +-1
        # (measured ~0.53-0.86 of gap; 0.35 = 1.5-2.4x margin).
        assert tgt[1.0] >= 0.35 * ATTR_GAPS[ai], (name, tgt)
        assert tgt[-1.0] <= -0.35 * ATTR_GAPS[ai], (name, tgt)
        # Non-target content preserved: every OTHER detector moves a small
        # fraction of the target's move (measured worst 0.14; 0.40 bound).
        for s in (-1.0, 1.0):
            cross = np.abs([d[s][j] for j in range(3) if j != ai]).max()
            assert cross <= 0.40 * abs(tgt[s]), (name, s, d[s])


def test_report_cli_demo_grid_and_detector_scores(trained):
    """`infer.py report` on a synthetic_attr profile writes the manipulation
    demo grids + quantitative detector scores (the report-section demo the
    round-4 verdict asked for)."""
    _, profile, out = trained
    import dataclasses

    pd = dataclasses.asdict(profile)
    prof_path = out / "attrsem.json"
    prof_path.write_text(json.dumps(pd))
    rep = out / "report"
    r = subprocess.run(
        [sys.executable, "infer.py", "report", str(prof_path), "--cpu",
         "--batches", "4", "-n", "4", "--swd-images", "0",
         "-o", str(rep)],
        capture_output=True, text=True, timeout=900, cwd="/root/repo",
    )
    assert r.returncode == 0, r.stderr[-3000:]
    report = json.loads((rep / "report.json").read_text())
    man = report["manipulate"]
    assert man["num_attributes"] == 3
    for ai, name in enumerate(ATTR_NAMES):
        assert (rep / f"manipulate_attr{ai}.png").stat().st_size > 0
        ds = man["detector_dscore"][name]
        # Target detector responds with the strength's sign at +-1.5.
        assert ds["+1.50"][ai] > 0 > ds["-1.50"][ai], (name, ds)
    assert (rep / "delta.npz").stat().st_size > 0
