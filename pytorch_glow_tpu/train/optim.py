"""Optimizer + LR-schedule registry (reference: upstream:network/builder.py
optimizer/scheduler registries; SURVEY.md §2.1 #18).

Composed from optax primitives:  clip-by-value (max_grad_clip) ->
clip-by-global-norm (max_grad_norm) -> adam/adamax with a warmup schedule —
the same semantics the reference applies manually in its Trainer loop
(clamp + clip_grad_norm_; SURVEY.md §2.1 #19).
"""

from __future__ import annotations

import optax

from pytorch_glow_tpu.config import OptimConfig, TrainConfig


def make_schedule(cfg: OptimConfig) -> optax.Schedule:
    if cfg.schedule == "constant":
        return optax.constant_schedule(cfg.lr)
    if cfg.schedule == "warmup":
        # Linear ramp to lr over warmup_steps, then constant (the reference
        # lineage's default warmup behavior).
        return _linear_warmup(cfg.lr, cfg.warmup_steps)
    if cfg.schedule == "noam":
        w = float(cfg.warmup_steps)

        def sched(step):
            s = step + 1.0
            return cfg.lr * (w**0.5) * _minimum(s**-0.5, s * w**-1.5)

        return sched
    raise ValueError(f"unknown schedule: {cfg.schedule}")


def _minimum(a, b):
    import jax.numpy as jnp

    return jnp.minimum(a, b)


def _linear_warmup(lr: float, warmup: int):
    import jax.numpy as jnp

    def sched(step):
        return lr * jnp.minimum(1.0, (step + 1.0) / max(1, warmup))

    return sched


def make_optimizer(
    opt_cfg: OptimConfig,
    train_cfg: TrainConfig,
    schedule: optax.Schedule | None = None,
) -> optax.GradientTransformation:
    """`schedule` overrides the profile's lr schedule while keeping the whole
    production chain (clipping, accumulation, skip-nonfinite) — used by
    scripts/lr_probe.py's exponential lr-range ramp."""
    sched = schedule if schedule is not None else make_schedule(opt_cfg)
    if opt_cfg.name == "adam":
        core = optax.adam(sched, b1=opt_cfg.betas[0], b2=opt_cfg.betas[1], eps=opt_cfg.eps)
    elif opt_cfg.name == "adamax":
        core = optax.adamax(sched, b1=opt_cfg.betas[0], b2=opt_cfg.betas[1], eps=opt_cfg.eps)
    else:
        raise ValueError(f"unknown optimizer: {opt_cfg.name}")
    chain = []
    if train_cfg.max_grad_clip and train_cfg.max_grad_clip > 0:
        chain.append(optax.clip(train_cfg.max_grad_clip))
    if train_cfg.max_grad_norm and train_cfg.max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(train_cfg.max_grad_norm))
    chain.append(core)
    tx = optax.chain(*chain)
    if getattr(train_cfg, "grad_accum", 1) > 1:
        # Accumulate N micro-batch grads per optimizer step (the TPU-native
        # answer to "batch does not fit": no reference counterpart).
        tx = optax.MultiSteps(tx, every_k_schedule=train_cfg.grad_accum)
    if getattr(train_cfg, "skip_nonfinite_updates", 0) > 0:
        # Skip optimizer updates whose grads contain NaN/Inf (Glow-paper
        # practice; affine-coupling scales can transiently saturate).
        # Outermost so a skipped step leaves ALL inner state — including
        # MultiSteps accumulators — untouched.  Found necessary by an
        # 8k-step hardware soak: one NaN step at 6700 otherwise kills the
        # run, and bitwise-deterministic resume replays the same NaN.
        tx = optax.apply_if_finite(
            tx, max_consecutive_errors=train_cfg.skip_nonfinite_updates
        )
    return tx
