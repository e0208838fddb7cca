"""AOT HBM capacity report (scripts/memory_report.py): compiles the
production train/sample fns without executing them and reports XLA's
buffer-assignment stats."""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "scripts"))

import memory_report  # noqa: E402


def test_memory_report_tiny(capsys):
    r = memory_report.main(["tiny-cifar10", "--batch-size", "8", "--cpu"])
    out = capsys.readouterr().out
    assert out.strip().startswith("{") and '"train_fits"' in out
    assert r["train_batch"] == 8
    assert r["param_bytes"] > 1e6
    assert r["train"]["peak_bytes"] > 0
    assert r["train"]["temp_bytes"] > r["sample"]["temp_bytes"] > 0
    assert r["train_fits"] is True  # tiny config vs 16 GB


def test_memory_report_y_conditional(capsys):
    """y-conditional profiles lower with the one-hot argument."""
    r = memory_report.main([
        "tiny-cifar10", "--batch-size", "4", "--cpu",
        "--set", "glow.y_condition=true", "--set", "glow.y_classes=10",
    ])
    capsys.readouterr()
    assert r["train"]["peak_bytes"] > 0 and r["sample"]["peak_bytes"] > 0
