"""Trainer: the step loop with logging, sampling grids, and checkpoints.

Reference behavior (upstream:network/trainer.py; SURVEY.md §2.1 #19):
epoch/step loop, actnorm warm-up on first batch (done in Builder here),
loss backward + clip (inside the jitted step here), scalar logs every
`scalar_log_gap`, sample/reconstruction grids every `plot_gap`, snapshot
every `checkpoint_gap`.  TPU-native differences: the loop is step-based
(infinite host iterator), the device never syncs except at log boundaries,
and all heavy work lives in one donated jit.
"""

from __future__ import annotations

import os
import signal
import sys
import threading
import time

import jax
import numpy as np

from pytorch_glow_tpu.train import step as steplib
from pytorch_glow_tpu.train.builder import Built, _labels_to_onehot
from pytorch_glow_tpu.utils.image import save_image_grid
from pytorch_glow_tpu.utils.metrics import MetricLogger


def _preempt_stop(preempt: dict, step: int, log_gap: int) -> bool:
    """True when training should stop for a delivered SIGTERM.

    TPU pods deliver SIGTERM with a grace period on preemption/maintenance;
    stopping at a step boundary lets the final snapshot capture a valid
    state.  Under multi-process the per-process flag must become a
    COLLECTIVE decision (a one-sided break would leave peers blocked in the
    next step's collectives), so it is OR-reduced across processes at
    `scalar_log_gap` boundaries — the same step numbers on every process.
    """
    if jax.process_count() == 1:
        return preempt["sig"] is not None
    if log_gap and step % log_gap != 0:
        return False
    from jax.experimental import multihost_utils

    flags = multihost_utils.process_allgather(
        np.asarray(1 if preempt["sig"] is not None else 0, np.int32)
    )
    return bool(np.any(flags))


WEDGE_EXIT_CODE = 17  # distinct from crash codes so supervisors can tell
_WEDGE_BUDGET_ENV = "GLOW_WEDGE_RESTART_BUDGET"


class _StepWatchdog:
    """Liveness watchdog for wedged device dispatches (SURVEY.md §5 failure
    recovery; no reference counterpart).

    Field-motivated: on tunneled TPUs a device RPC can wedge mid-dispatch
    and never return (observed 50+ min on a round-5 soak).  Nothing
    Python-level can recover in-process: the SIGTERM handler only runs
    between main-thread bytecodes (never, while the main thread is stuck in
    a C call), and `--retries` would reuse the same wedged client.  A fresh
    process with a fresh client was verified to reach the chip while the
    wedged one hung, so the recovery unit is the PROCESS:

    - `beat()` is called once per loop iteration; the watchdog thread arms
      at the second beat (the first iteration pays the jit compile, which
      can legitimately take many minutes on remote Mosaic).
    - If no beat lands for `timeout_s`, the watchdog prints a diagnostic
      and (a) re-execs the process when a restart budget is available
      (`train.py --retries N` exports GLOW_WEDGE_RESTART_BUDGET; the
      re-exec'd run resumes from the latest rolling snapshot), else
      (b) exits with WEDGE_EXIT_CODE for an external supervisor.  Under
      multi-process training it always exits — a one-sided re-exec would
      desynchronize the collective mesh; the cluster manager owns restarts.
    """

    def __init__(self, timeout_s: float, poll_s: float | None = None):
        self.timeout_s = timeout_s
        self.poll_s = poll_s if poll_s is not None else min(10.0, max(0.5, timeout_s / 10))
        self._last = time.monotonic()
        self._beats = 0
        self._stop = threading.Event()
        self._thread: threading.Thread | None = None

    def beat(self) -> None:
        self._beats += 1
        self._last = time.monotonic()
        if self._beats == 2 and self._thread is None:
            self._thread = threading.Thread(
                target=self._watch, daemon=True, name="glow-step-watchdog"
            )
            self._thread.start()

    def stop(self) -> None:
        self._stop.set()

    def _watch(self) -> None:
        while not self._stop.wait(self.poll_s):
            stale = time.monotonic() - self._last
            if stale > self.timeout_s:
                sys.stderr.write(
                    f"[train] step-liveness watchdog: no progress for "
                    f"{stale:.0f}s (> {self.timeout_s:.0f}s) after "
                    f"{self._beats} loop beats — device dispatch presumed "
                    f"wedged; abandoning this process (latest rolling "
                    f"snapshot is the resume point)\n"
                )
                sys.stderr.flush()
                self._die()
                return

    def _die(self) -> None:
        if jax.process_count() == 1:
            budget = int(os.environ.get(_WEDGE_BUDGET_ENV, "0") or 0)
            if budget > 0:
                os.environ[_WEDGE_BUDGET_ENV] = str(budget - 1)
                sys.stderr.write(
                    f"[train] watchdog re-exec (fresh device client; "
                    f"{budget - 1} restart(s) left): "
                    f"{sys.executable} {' '.join(sys.argv)}\n"
                )
                sys.stderr.flush()
                os.execv(sys.executable, [sys.executable] + sys.argv)
        os._exit(WEDGE_EXIT_CODE)


def _data_state(built: Built):
    """Host-stream position to save beside the snapshot (O(1) resume)."""
    if built.data is not None and hasattr(built.data, "get_state"):
        return built.data.get_state()
    return None


def train(built: Built, num_steps: int | None = None, quiet: bool = False) -> dict:
    p = built.profile
    t = p.train
    num_steps = num_steps if num_steps is not None else t.num_steps
    out_dir = os.path.join(p.out_dir, p.name)
    logger = MetricLogger(out_dir, t.batch_size, quiet=quiet)

    if t.debug_nans:
        jax.config.update("jax_debug_nans", True)

    from pytorch_glow_tpu.utils.summary import summarize

    if not quiet:
        print(f"[train] {summarize(built.state['params'], p.glow)}", flush=True)

    state = built.state
    step = built.start_step
    last_metrics: dict = {}
    t_start = time.perf_counter()
    profiling = False
    failed = False
    nonfinite_logs = 0

    # Graceful preemption (SURVEY.md §5 failure recovery, beyond-reference):
    # catch SIGTERM, finish the in-flight step, snapshot, return cleanly.
    # Signal handlers can only be installed from the main thread; elsewhere
    # (e.g. tests driving train() from a worker) preemption stays disabled.
    preempt: dict = {"sig": None}
    stopped_early = False
    in_main = threading.current_thread() is threading.main_thread()
    prev_handler = None
    if in_main:
        prev_handler = signal.signal(
            signal.SIGTERM, lambda signum, frame: preempt.__setitem__("sig", signum)
        )

    watchdog = None
    if t.step_timeout_s:
        watchdog = _StepWatchdog(t.step_timeout_s)

    try:
        while step < num_steps:
            if watchdog is not None:
                watchdog.beat()
            if _preempt_stop(preempt, step, t.scalar_log_gap):
                stopped_early = True
                if not quiet:
                    print(
                        f"[train] SIGTERM: stopping at step {step} "
                        f"(snapshot will be written)", flush=True
                    )
                break
            if t.profile_step and step == t.profile_step and not profiling:
                jax.profiler.start_trace(os.path.join(out_dir, "profile"))
                profiling = True
            spc = t.steps_per_call
            if spc > 1:
                group = [next(built.data) for _ in range(spc)]
                batch = group[-1]  # last micro-batch feeds plots/recon
                images = jax.numpy.stack([b["image"] for b in group])
                ys = [_labels_to_onehot(b, p) for b in group]
                y = ys[-1]
                y_stack = None if ys[0] is None else jax.numpy.stack(ys)
                state, metrics = built.train_step(state, images, y_stack)
            else:
                batch = next(built.data)
                y = _labels_to_onehot(batch, p)
                state, metrics = built.train_step(state, batch["image"], y)
            step += spc
            if step == built.start_step + spc:
                # First step paid the jit compile; don't let it skew the
                # images/sec window (its images are not counted either).
                jax.block_until_ready(metrics)
                logger.throughput.reset_clock()
            else:
                logger.throughput.update(spc)

            if profiling and step >= t.profile_step + t.profile_num_steps:
                jax.tree.map(
                    lambda a: a.block_until_ready() if hasattr(a, "block_until_ready") else a,
                    metrics,
                )
                jax.profiler.stop_trace()
                profiling = False

            if step % t.scalar_log_gap == 0 or step == num_steps:
                host = {k: float(v) for k, v in jax.device_get(metrics).items()}
                host["images_per_sec"] = logger.throughput.rate_and_reset()
                logger.scalars(step, host)
                last_metrics = host
                if not np.isfinite(host["loss"]):
                    # With skip_nonfinite_updates the optimizer drops bad
                    # steps, so an isolated NaN loss is survivable; only
                    # PERSISTENT non-finite logs mean poisoned params.
                    nonfinite_logs += 1
                    limit = 3 if t.skip_nonfinite_updates else 1
                    if nonfinite_logs >= limit:
                        raise FloatingPointError(
                            f"non-finite loss at step {step} "
                            f"({nonfinite_logs} consecutive logs): {host}"
                        )
                else:
                    nonfinite_logs = 0

            # Rolling snapshot BEFORE plot/eval at the same boundary: their
            # first iterations pay jit compiles (minutes on tunneled TPUs)
            # and a crash mid-plot/eval must not lose everything since the
            # previous snapshot (found by a resumed-soak on real hardware).
            if built.ckpt is not None and t.checkpoint_gap and step % t.checkpoint_gap == 0:
                built.ckpt.save(step, state, data_state=_data_state(built))

            if t.plot_gap and step % t.plot_gap == 0:
                rng = jax.random.fold_in(jax.random.key(t.seed + 2), step)
                y_s = None if y is None else y[: t.num_sample_images]
                temp = t.sample_temperature
                if t.temperature_anneal_steps:
                    temp *= min(1.0, step / t.temperature_anneal_steps)
                plot_params = steplib.ema_params(state)
                samples = np.asarray(
                    built.sample_fn(plot_params, rng, y_s, np.float32(temp))
                )
                save_image_grid(
                    os.path.join(out_dir, "samples", f"step_{step:08d}.png"), samples
                )
                recon = np.asarray(
                    built.reconstruct_fn(
                        state["params"], batch["image"][: t.num_sample_images]
                    )
                )
                save_image_grid(
                    os.path.join(out_dir, "recon", f"step_{step:08d}.png"), recon
                )

            if t.eval_gap and step % t.eval_gap == 0:
                eval_it = built.extras.get("eval_data")
                if eval_it is not None:
                    import itertools

                    eval_params = steplib.ema_params(state)
                    eval_batches = list(itertools.islice(eval_it, t.eval_batches))
                    if eval_batches:
                        # All eval batches in ONE jitted dispatch (tunneled
                        # TPUs pay 20-200 ms latency per dispatch).
                        images = jax.numpy.stack(
                            [b["image"] for b in eval_batches]
                        )
                        ys = [_labels_to_onehot(b, p) for b in eval_batches]
                        y_stack = None if ys[0] is None else jax.numpy.stack(ys)
                        nll = float(
                            built.extras["eval_step_n"](
                                eval_params, images, y_stack
                            )["nll"]
                        )
                        ev = {"eval_nll": nll}
                        if "ema" in state:
                            # EMA-vs-raw A/B for free: eval_nll above used the
                            # EMA params; score the live params on the SAME
                            # batches so every EMA run carries its own control.
                            ev["eval_nll_raw"] = float(
                                built.extras["eval_step_n"](
                                    state["params"], images, y_stack
                                )["nll"]
                            )
                        # Round-trip drift guard: decode(encode(x)) must stay
                        # within one uint8 quantization bin (north-star
                        # exactness, checked continuously in production).
                        xb = np.asarray(eval_batches[0]["image"][: t.num_sample_images])
                        rec = np.asarray(
                            built.reconstruct_fn(state["params"], xb)
                        )
                        if xb.dtype != np.uint8:
                            xb = np.asarray(
                                jax.device_get(
                                    steplib.glow.postprocess(jax.numpy.asarray(xb), p.glow)
                                )
                            )
                        ev["recon_err_max_u8"] = float(
                            np.abs(xb.astype(np.int16) - rec.astype(np.int16)).max()
                        )
                        # Best-checkpoint tracking: keep the snapshot with the
                        # lowest held-out bits/dim (model selection; the
                        # rolling keep=N window only preserves the latest).
                        if built.ckpt is not None and np.isfinite(ev["eval_nll"]):
                            if built.ckpt.maybe_save_best(step, state, ev["eval_nll"]):
                                ev["best_eval_nll"] = ev["eval_nll"]
                        logger.scalars(step, ev)

            if t.swd_gap and step % t.swd_gap == 0:
                # Sample-quality trajectory (SURVEY.md §5 observability):
                # multi-scale sliced Wasserstein between the current training
                # batch and T=1.0 samples from the eval (EMA) params.
                from pytorch_glow_tpu.utils.swd import sliced_wasserstein

                n = min(t.swd_images, t.batch_size)
                rng = jax.random.fold_in(jax.random.key(t.seed + 3), step)
                y_s = None if y is None else y[:n]
                fake = np.asarray(
                    built.extras["swd_sample_fn"](
                        steplib.ema_params(state), rng, y_s
                    )
                )
                real = np.asarray(batch["image"][:n])
                if real.dtype != np.uint8:
                    # Pre-processed float pipeline: bring reals back to the
                    # samples' uint8 scale before comparing patch statistics.
                    real = np.asarray(
                        jax.device_get(
                            steplib.glow.postprocess(jax.numpy.asarray(real), p.glow)
                        )
                    )
                swd = sliced_wasserstein(real, fake, seed=t.seed)
                logger.scalars(step, {"swd_x1e3": swd["swd_avg"]})
    except BaseException:
        # Do NOT snapshot on the way out of a failure: `state` may reference
        # donated (deleted) buffers if train_step itself raised, and a
        # non-finite-loss state would poison --retries auto-resume (the
        # rolling keep=N window could rotate out the last good snapshot).
        failed = True
        raise
    finally:
        if watchdog is not None:
            # The final snapshot below may itself block on the device; a
            # wedge there must still fire, so only the thread's poll keeps
            # running — but a CLEAN exit must not trip it mid-save, hence
            # one last beat before the (bounded-work) teardown.
            watchdog.beat()
        if in_main:
            signal.signal(signal.SIGTERM, prev_handler or signal.SIG_DFL)
        if profiling:
            jax.profiler.stop_trace()
        if built.ckpt is not None and not failed:
            built.ckpt.save(step, state, wait=True, data_state=_data_state(built))
            # Barrier on in-flight ASYNC best saves too: orbax finalization
            # cannot run during interpreter shutdown ("cannot schedule new
            # futures after shutdown" — observed losing a final-step best
            # snapshot on a 20k soak), so drain before the process can exit.
            built.ckpt.wait()
        if watchdog is not None:
            watchdog.stop()  # teardown done; don't police the caller
        logger.close()

    built.state = state
    wall = time.perf_counter() - t_start
    result = {"final_step": step, "wall_s": wall, **last_metrics}
    if stopped_early:
        result["preempted"] = True  # resumable: rerun the same command
    return result
