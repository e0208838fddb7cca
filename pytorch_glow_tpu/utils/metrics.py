"""Metrics / observability (reference: tensorboardX SummaryWriter scalars +
image grids in upstream:network/trainer.py; SURVEY.md §5).

Writers:
* CsvWriter      — always on; one `metrics.csv` per run, easy to diff/plot.
* TBWriter       — TensorBoard event files via tf.summary when TF is
                   importable (it is in this image); silently disabled
                   otherwise.
* MetricLogger   — fan-out to both + stdout, plus an images/sec meter
                   (the driver's headline counter).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Any

import numpy as np


class CsvWriter:
    """CSV scalars with a growable schema: rows append in O(1); only a
    late-appearing metric (e.g. a periodic eval_nll) extending the header
    triggers a one-off rewrite of the file."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self.path = path
        self._fields: list[str] = []
        self._rows: list[dict] = []
        if os.path.isfile(path):
            with open(path, newline="") as f:
                reader = csv.DictReader(f)
                self._fields = list(reader.fieldnames or [])
                self._rows = list(reader)

    def _rewrite(self) -> None:
        with open(self.path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fields, restval="")
            w.writeheader()
            w.writerows(self._rows)

    def scalars(self, step: int, values: dict[str, float]) -> None:
        row = {"step": step, **{k: float(v) for k, v in values.items()}}
        grew = False
        for k in row:
            if k not in self._fields:
                self._fields.append(k)
                grew = True
        self._rows.append(row)
        if grew or not os.path.isfile(self.path):
            self._rewrite()
        else:
            with open(self.path, "a", newline="") as f:
                csv.DictWriter(f, fieldnames=self._fields, restval="").writerow(row)

    def close(self) -> None:
        pass


class TBWriter:
    def __init__(self, logdir: str):
        self._writer = None
        try:
            import tensorflow as tf  # noqa: PLC0415

            self._tf = tf
            self._writer = tf.summary.create_file_writer(logdir)
        except Exception:
            self._tf = None

    def scalars(self, step: int, values: dict[str, float]) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            for k, v in values.items():
                self._tf.summary.scalar(k, float(v), step=step)

    def image(self, step: int, tag: str, image: np.ndarray) -> None:
        if self._writer is None:
            return
        with self._writer.as_default():
            self._tf.summary.image(tag, image[None], step=step)

    def close(self) -> None:
        if self._writer is not None:
            self._writer.close()


class Throughput:
    """images/sec meter over a sliding window of steps."""

    def __init__(self, batch_size: int):
        self.batch_size = batch_size
        self._t0 = time.perf_counter()
        self._steps = 0

    def update(self, n_steps: int = 1) -> None:
        self._steps += n_steps

    def reset_clock(self) -> None:
        """Restart the window (used to drop the first step's jit compile)."""
        self._t0 = time.perf_counter()
        self._steps = 0

    def rate_and_reset(self) -> float:
        t1 = time.perf_counter()
        rate = self._steps * self.batch_size / max(1e-9, t1 - self._t0)
        self._t0, self._steps = t1, 0
        return rate


class MetricLogger:
    def __init__(self, out_dir: str, batch_size: int, quiet: bool = False):
        self.csv = CsvWriter(os.path.join(out_dir, "metrics.csv"))
        self.tb = TBWriter(os.path.join(out_dir, "tb"))
        self.throughput = Throughput(batch_size)
        self.quiet = quiet

    def scalars(self, step: int, values: dict[str, Any]) -> None:
        vals = {k: float(v) for k, v in values.items()}
        self.csv.scalars(step, vals)
        self.tb.scalars(step, vals)
        if not self.quiet:
            msg = " ".join(f"{k}={v:.4g}" for k, v in vals.items())
            print(f"[step {step}] {msg}", flush=True)

    def image(self, step: int, tag: str, image: np.ndarray) -> None:
        self.tb.image(step, tag, image)

    def close(self) -> None:
        self.csv.close()
        self.tb.close()
