"""CLI end-to-end: train.py and every infer.py subcommand on a synthetic
on-disk CelebA dataset (SURVEY.md §2.1 #1-#2, §3.1-§3.2)."""

import json
import os
import sys

import numpy as np
import pytest
from PIL import Image

REPO = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, REPO)

import infer as infer_cli  # noqa: E402
import train as train_cli  # noqa: E402


@pytest.fixture(scope="module")
def celeba_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("celeba")
    img_dir = root / "img_align_celeba"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    names = [f"{i:06d}.jpg" for i in range(1, 25)]
    for n in names:
        Image.fromarray(
            rng.integers(0, 256, (12, 10, 3), dtype=np.uint8)
        ).save(img_dir / n, quality=95)
    attrs = rng.choice([-1, 1], size=(len(names), 40))
    lines = [str(len(names)), " ".join(f"A{i}" for i in range(40))]
    for n, row in zip(names, attrs):
        lines.append(n + " " + " ".join(map(str, row)))
    (root / "list_attr_celeba.txt").write_text("\n".join(lines) + "\n")
    return str(root)


@pytest.fixture(scope="module")
def trained(celeba_root, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("out"))
    prof_path = os.path.join(out, "p.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "cli",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                          "K": 2, "L": 2},
                "train": {"batch_size": 8, "num_steps": 6, "scalar_log_gap": 6,
                           "plot_gap": 0, "checkpoint_gap": 3,
                           "num_sample_images": 4},
                "data": {"name": "celeba", "image_size": 8, "num_workers": 2},
            },
            f,
        )
    r = train_cli.main([prof_path, "--data-root", celeba_root,
                        "--out-dir", out, "--quiet"])
    assert r["final_step"] == 6
    return prof_path, out, celeba_root


def _run_infer(args):
    infer_cli.main(args)


def test_infer_sample(trained, tmp_path):
    prof, out, root = trained
    png = str(tmp_path / "s.png")
    _run_infer(["sample", prof, "-n", "4", "--out-dir", out, "-o", png])
    assert os.path.getsize(png) > 0


def test_infer_best_without_checkpoint_errors(trained, tmp_path):
    """`--best` on an out-dir with no checkpoints must fail loudly instead of
    silently scoring a fresh init (a mis-pointed --out-dir once produced
    garbage report numbers; infer.py now sys.exits)."""
    prof, out, root = trained
    empty = str(tmp_path / "empty_out")
    with pytest.raises(SystemExit, match="no checkpoint"):
        _run_infer(["sample", prof, "-n", "2", "--best",
                    "--out-dir", empty, "-o", str(tmp_path / "x.png")])


def test_infer_recon(trained, tmp_path):
    prof, out, root = trained
    png = str(tmp_path / "r.png")
    _run_infer(["recon", prof, "-n", "2", "--data-root", root,
                "--out-dir", out, "-o", png])
    assert os.path.getsize(png) > 0


def test_infer_exact_on_bf16_profile(celeba_root, tmp_path, capsys):
    """--exact runs a bf16-trained profile's inference on the f32/XLA path
    (same params, pure inference-time choice) with an exact round-trip."""
    out = str(tmp_path / "out")
    prof_path = str(tmp_path / "p.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "cli-bf16",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                          "K": 2, "L": 2, "compute_dtype": "bfloat16"},
                "train": {"batch_size": 8, "num_steps": 4, "scalar_log_gap": 4,
                           "plot_gap": 0, "checkpoint_gap": 4,
                           "num_sample_images": 4},
                "data": {"name": "celeba", "image_size": 8, "num_workers": 2},
            },
            f,
        )
    r = train_cli.main([prof_path, "--data-root", celeba_root,
                        "--out-dir", out, "--quiet"])
    assert r["final_step"] == 4
    png = str(tmp_path / "r.png")
    _run_infer(["recon", prof_path, "-n", "2", "--data-root", celeba_root,
                "--out-dir", out, "-o", png, "--exact"])
    text = capsys.readouterr().out
    err = float(text.split("max |x - rec| = ")[1])
    assert err <= 1.0, text  # f32 path: exact to the quantization bin


def test_infer_delta_then_manipulate_and_interpolate(trained, tmp_path):
    prof, out, root = trained
    npz = str(tmp_path / "delta.npz")
    _run_infer(["delta", prof, "--data-root", root, "--out-dir", out,
                "--batches", "2", "-o", npz])
    delta = np.load(npz, allow_pickle=True)["delta"]
    assert delta.shape[0] == 40 and np.isfinite(delta).all()

    png = str(tmp_path / "m.png")
    _run_infer(["manipulate", prof, "--delta", npz, "--attr", "5",
                "--strength", "1.5", "--data-root", root, "--out-dir", out,
                "-n", "2", "-o", png])
    assert os.path.getsize(png) > 0

    png2 = str(tmp_path / "i.png")
    _run_infer(["interpolate", prof, "--data-root", root, "--out-dir", out,
                "--steps", "4", "-o", png2])
    assert os.path.getsize(png2) > 0


def test_infer_nll(trained, capsys):
    prof, out, root = trained
    _run_infer(["nll", prof, "--data-root", root, "--out-dir", out,
                "--batches", "2"])
    assert "bits/dim" in capsys.readouterr().out


def test_infer_synthetic_flag(trained, capsys):
    """infer.py --synthetic must route through resolve_profile's family map
    (regression: the bare flag used to pass a bool and KeyError)."""
    prof, out, root = trained
    _run_infer(["nll", prof, "--synthetic", "--out-dir", out, "--batches", "1"])
    assert "bits/dim" in capsys.readouterr().out


def test_infer_nll_dequant_bound(trained, capsys):
    """--dequant-samples N reports a VALID discrete-NLL bound (elbo/iwae)."""
    prof, out, root = trained
    _run_infer(["nll", prof, "--data-root", root, "--out-dir", out,
                "--batches", "1", "--dequant-samples", "2", "--bound", "iwae"])
    text = capsys.readouterr().out
    assert "bits/dim" in text and "iwae bound, 2 noise draws" in text


def test_infer_export_then_serve(trained, tmp_path):
    """export a trained checkpoint to a serving artifact, then serve from it
    with no profile/checkpoint access."""
    prof, out, root = trained
    art = str(tmp_path / "artifact")
    _run_infer(["export", prof, "--out-dir", out, "--batch-size", "4",
                "-o", art])
    assert os.path.isfile(os.path.join(art, "manifest.json"))

    png = str(tmp_path / "served.png")
    _run_infer(["serve", art, "--temperature", "0.5", "-o", png])
    assert os.path.getsize(png) > 0


def test_set_overrides_resolve():
    """`--set section.key=value` overrides any profile field from the CLI
    (JSON-parsed values, typed coercion, top-level scalars)."""
    ns = train_cli.parse_args([
        "cifar10",
        "--set", "optim.lr=2e-4",
        "--set", "data.name=image_folder",
        "--set", "glow.image_shape=[64,64,3]",
        "--set", "train.augment_flip=true",
        "--set", "out_dir=results/xx",
    ])
    prof = train_cli.resolve_profile(ns)
    assert prof.optim.lr == 2e-4
    assert prof.data.name == "image_folder"
    assert prof.glow.image_shape == (64, 64, 3)
    assert prof.train.augment_flip is True
    assert prof.out_dir == "results/xx"


def test_set_overrides_typo_rejected():
    for bad in ("optim.lrr=1e-3", "nosuch.lr=1e-3", "badscalar=3", "optim.lr"):
        ns = train_cli.parse_args(["cifar10", "--set", bad])
        with pytest.raises(KeyError):
            train_cli.resolve_profile(ns)


def test_train_rejects_unknown_profile():
    with pytest.raises(SystemExit):
        train_cli.main(["definitely-not-a-preset", "--quiet"])


def test_train_sigterm_preempts_cleanly_and_resumes(tmp_path):
    """Graceful preemption (SURVEY.md §5 failure recovery): SIGTERM mid-run
    -> the trainer stops at the next step boundary, writes a snapshot, and
    exits 0 with {"preempted": true}; re-running the same command resumes
    from that snapshot and completes."""
    import signal
    import subprocess
    import time

    out = str(tmp_path)
    prof_path = os.path.join(out, "p.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "pre",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                          "K": 2, "L": 2},
                # num_steps far beyond what fits in the wait window: if the
                # SIGTERM path regresses, the run outlives the timeout below
                # and the test fails instead of passing by completion.
                "train": {"batch_size": 8, "num_steps": 50000,
                           "scalar_log_gap": 1, "plot_gap": 0, "eval_gap": 0,
                           "checkpoint_gap": 0, "num_sample_images": 4},
                "data": {"name": "synthetic", "image_size": 8},
            },
            f,
        )
    csv_path = os.path.join(out, "pre", "metrics.csv")
    proc = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "train.py"), prof_path,
         "--out-dir", out, "--quiet", "--cpu"],
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
        env={k: v for k, v in os.environ.items()
             if k not in ("XLA_FLAGS", "JAX_PLATFORMS")},
    )
    try:
        # Wait until the step loop is live (first scalar row logged) so the
        # handler is installed before the signal lands.
        deadline = time.time() + 240
        while time.time() < deadline:
            if os.path.isfile(csv_path) and len(
                open(csv_path).read().splitlines()
            ) >= 2:
                break
            if proc.poll() is not None:
                raise AssertionError(
                    f"train exited early: {proc.stderr.read()[-3000:]}"
                )
            time.sleep(0.5)
        else:
            raise AssertionError("step loop never became live")
        proc.send_signal(signal.SIGTERM)
        stdout, stderr = proc.communicate(timeout=180)
    finally:
        if proc.poll() is None:
            proc.kill()
            proc.communicate()
    assert proc.returncode == 0, stderr[-3000:]
    result = json.loads(stdout.splitlines()[-1])
    assert result.get("preempted") is True
    stopped = result["final_step"]
    assert 0 < stopped < 50000

    # The preemption snapshot is resumable: finish a slightly longer run.
    r2 = train_cli.main([prof_path, "--out-dir", out, "--quiet",
                         "--steps", str(stopped + 2)])
    assert r2["final_step"] == stopped + 2
    assert "preempted" not in r2


def test_infer_report(trained, tmp_path, capsys):
    """One-command quality report: temperature-ladder sample sheets, exact
    round-trip drift, interpolation, and all three NLL protocols."""
    prof, out, root = trained
    rep = str(tmp_path / "report")
    _run_infer(["report", prof, "--data-root", root, "--out-dir", out,
                "--batches", "1", "-n", "2", "--steps", "3", "-o", rep,
                "--swd-images", "16"])
    assert "report.json" in capsys.readouterr().out
    with open(os.path.join(rep, "report.json")) as f:
        r = json.load(f)
    assert set(r["bits_dim"]) == {
        "noise_free_corner", "elbo_1draw", "iwae_8draw", "eval_images"
    }
    assert np.isfinite(r["bits_dim"]["elbo_1draw"])
    # Sample-quality axis: multi-scale SWD vs held-out data (x1e3).
    assert r["swd_x1e3"]["images_per_set"] == 16
    assert np.isfinite(r["swd_x1e3"]["swd_avg"]) and r["swd_x1e3"]["swd_avg"] > 0
    assert r["recon_drift_u8"]["max"] <= 1  # f32 path: exact round-trip
    for name in ("recon.png", "interpolate.png", "samples_t0.70.png"):
        assert os.path.getsize(os.path.join(rep, name)) > 0


def test_infer_sample_class_conditional(tmp_path, capsys):
    """--class-id samples a chosen class via the one-hot prior shift on a
    y-conditional profile; on an unconditional profile it errors loudly."""
    out = str(tmp_path)
    prof_path = os.path.join(out, "yc.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "yc",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                          "K": 2, "L": 2, "y_condition": True,
                          "y_classes": 4, "y_multi_class": False},
                "train": {"batch_size": 8, "num_steps": 2, "scalar_log_gap": 2,
                           "plot_gap": 0, "checkpoint_gap": 2,
                           "num_sample_images": 4},
                "data": {"name": "synthetic", "image_size": 8},
            },
            f,
        )
    train_cli.main([prof_path, "--out-dir", out, "--quiet"])
    png = str(tmp_path / "c.png")
    _run_infer(["sample", prof_path, "-n", "2", "--class-id", "3",
                "--out-dir", out, "-o", png])
    assert "class 3" in capsys.readouterr().out
    assert os.path.getsize(png) > 0


def test_infer_sample_class_id_rejected_unconditional(trained, tmp_path):
    prof, out, root = trained
    with pytest.raises(SystemExit):
        _run_infer(["sample", prof, "-n", "2", "--class-id", "1",
                    "--out-dir", out, "-o", str(tmp_path / "x.png")])


def test_infer_sample_class_id_out_of_range_rejected(tmp_path):
    """--class-id beyond y_classes would silently one-hot to zeros
    (unconditional samples labeled with the class) — must error."""
    out = str(tmp_path)
    prof_path = os.path.join(out, "yc2.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "yc2",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                          "K": 2, "L": 2, "y_condition": True,
                          "y_classes": 4, "y_multi_class": False},
                "train": {"batch_size": 8, "num_steps": 2, "scalar_log_gap": 2,
                           "plot_gap": 0, "checkpoint_gap": 2,
                           "num_sample_images": 4},
                "data": {"name": "synthetic", "image_size": 8},
            },
            f,
        )
    train_cli.main([prof_path, "--out-dir", out, "--quiet"])
    with pytest.raises(SystemExit):
        _run_infer(["sample", prof_path, "-n", "2", "--class-id", "4",
                    "--out-dir", out, "-o", str(tmp_path / "x.png")])


def test_lr_probe_finds_blowup(tmp_path):
    """scripts/lr_probe.py: the exponential lr-range ramp detects the
    instability onset of a micro config and recommends a peak below it."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "lr_probe", os.path.join(REPO, "scripts", "lr_probe.py")
    )
    lr_probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lr_probe)

    prof_path = str(tmp_path / "micro.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "micro",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                         "K": 2, "L": 2},
                "train": {"batch_size": 16},
                "data": {"name": "synthetic_textured"},
            },
            f,
        )
    out = lr_probe.main([prof_path, "--cpu", "--lr0", "1e-4", "--lr1", "5.0",
                         "--steps", "160", "--spc", "5", "--min-steps", "20",
                         "--quiet"])
    assert out["onset_lr"] is not None, out
    assert 1e-4 < out["onset_lr"] <= 5.0
    assert out["recommended_peak"] == pytest.approx(out["onset_lr"] / 2)
    assert out["max_stable_lr"] < out["onset_lr"]


def test_lr_probe_from_checkpoint(trained):
    """--out-dir probes FROM a trained snapshot (the divergence-forensic
    protocol): optimizer state restores into the probe's ramp chain and the
    ramp starts at the checkpoint step."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "lr_probe", os.path.join(REPO, "scripts", "lr_probe.py")
    )
    lr_probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lr_probe)

    prof_path, out, _ = trained
    res = lr_probe.main([prof_path, "--cpu", "--out-dir", out,
                         "--lr0", "1e-3", "--lr1", "10.0", "--steps", "60",
                         "--spc", "5", "--min-steps", "10", "--quiet"])
    assert res["start_step"] == 6
    assert res["onset_lr"] is not None and res["onset_step"] > 6


def test_lr_probe_ramps_in_optimizer_steps_under_grad_accum(tmp_path):
    """With grad_accum=k, optax.MultiSteps indexes the lr schedule by
    OPTIMIZER steps (one per k micro-batches).  The probe must ramp in that
    unit: if it ramped in micro-steps, the applied lr would top out at
    lr0*(lr1/lr0)^(1/k) — far below lr1 — and this wildly-unstable ramp
    would read as a clean run."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "lr_probe", os.path.join(REPO, "scripts", "lr_probe.py")
    )
    lr_probe = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(lr_probe)

    prof_path = str(tmp_path / "micro.json")
    with open(prof_path, "w") as f:
        json.dump(
            {
                "name": "micro",
                "glow": {"image_shape": [8, 8, 3], "hidden_channels": 16,
                         "K": 2, "L": 2},
                "train": {"batch_size": 16, "grad_accum": 4},
                "data": {"name": "synthetic_textured"},
            },
            f,
        )
    out = lr_probe.main([prof_path, "--cpu", "--lr0", "1e-4", "--lr1", "5.0",
                         "--steps", "160", "--spc", "5", "--min-steps", "20",
                         "--quiet"])
    assert out["grad_accum"] == 4
    # The ramp reaches genuinely unstable lr within 160/4 = 40 optimizer
    # steps, so the blow-up must be detected; a micro-step-indexed ramp
    # caps the applied lr near 1.5e-3 and stays clean.
    assert out["onset_lr"] is not None, out
    assert 1e-4 < out["onset_lr"] <= 5.0
