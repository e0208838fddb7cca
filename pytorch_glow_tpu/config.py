"""Typed configuration for the TPU-native Glow framework.

Replaces the reference's JSON "profile" files (reference: upstream:profile/
celeba.json; SURVEY.md §2.1 #3) with frozen dataclasses.  JSON profiles are
still accepted — `profiles/*.json` map 1:1 onto these fields via
`utils/profiles.py` — so reference users keep their declarative workflow.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field


@dataclass(frozen=True)
class GlowConfig:
    """Model shape (reference profile section "Glow")."""

    image_shape: tuple[int, int, int] = (32, 32, 3)  # (H, W, C), NHWC
    hidden_channels: int = 512
    K: int = 32  # flow steps per level
    L: int = 3  # levels
    actnorm_scale: float = 1.0
    flow_permutation: str = "invconv"  # invconv | shuffle | reverse
    flow_coupling: str = "affine"  # affine | additive
    lu_decomposed: bool = True
    learn_top: bool = True
    y_condition: bool = False
    y_classes: int = 40
    y_multi_class: bool = True  # BCE over attributes (CelebA) vs softmax CE
    weight_y: float = 0.01
    n_bits_x: int = 8
    # uniform (paper-correct) | gaussian (reference-lineage quirk) |
    # variational (learned q(u|x), Flow++-style — tightens the bound by
    # ~0.06-0.1 bits/dim; models/vardeq.py) | none
    dequant: str = "uniform"
    # Variational-dequantization flow shape (used when dequant="variational";
    # <1% of model FLOPs at paper scale):
    vardeq_steps: int = 4
    vardeq_width: int = 64
    vardeq_context_width: int = 32
    # TPU knobs (no reference counterpart):
    compute_dtype: str = "float32"  # coupling-net compute: float32 | bfloat16
    remat: bool = False  # jax.checkpoint the per-step scan body
    invconv_impl: str = "xla"  # xla | pallas
    invconv_precision: str = "highest"  # highest | high | default (MXU passes)
    # Fused whole-flow-step Pallas kernel (actnorm + 1x1 mix + coupling in
    # one VMEM-resident pass; ops/flowstep_pallas.py).  The kernel computes
    # the coupling net in bf16 — pair with compute_dtype="bfloat16" so the
    # XLA fallback paths (DDI, gradients) see the same numerics.
    flowstep_impl: str = "xla"  # xla | pallas
    scan_unroll: int = 1  # lax.scan unroll factor for the K-step loop
    # Spatial GSPMD sharding (the image-model analog of sequence parallelism,
    # SURVEY.md §5): constrain activations to shard H over the "model" axis
    # whenever an ambient mesh is set and H divides. For 256x256/L=6 scale
    # where per-chip HBM binds; GSPMD inserts the conv halo exchanges.
    shard_spatial: bool = False

    @property
    def n_bins(self) -> float:
        return float(2**self.n_bits_x)

    def latent_shapes(self) -> list[tuple[int, int, int]]:
        """Per-level activation shape AFTER squeeze (what the K steps see)."""
        h, w, c = self.image_shape
        shapes = []
        for i in range(self.L):
            h, w, c = h // 2, w // 2, c * 4
            shapes.append((h, w, c))
            if i < self.L - 1:
                c = c // 2
        return shapes

    @property
    def final_latent_shape(self) -> tuple[int, int, int]:
        return self.latent_shapes()[-1]


@dataclass(frozen=True)
class OptimConfig:
    """Optimizer + schedule (reference profile section "Optim")."""

    name: str = "adam"  # adam | adamax
    lr: float = 1e-3
    betas: tuple[float, float] = (0.9, 0.999)
    eps: float = 1e-8
    schedule: str = "warmup"  # warmup (linear) | noam | constant
    warmup_steps: int = 4000


@dataclass(frozen=True)
class TrainConfig:
    """Training cadence (reference profile section "Train")."""

    batch_size: int = 64
    grad_accum: int = 1  # optimizer step every N micro-batches (optax.MultiSteps)
    steps_per_call: int = 1  # chain N train steps in one jit dispatch
    num_steps: int = 100_000
    max_grad_clip: float = 5.0  # elementwise clamp; 0 disables
    max_grad_norm: float = 100.0  # global-norm clip; 0 disables
    scalar_log_gap: int = 50
    plot_gap: int = 1000
    checkpoint_gap: int = 2000
    eval_gap: int = 0  # run held-out NLL eval every N steps (0 = off)
    eval_batches: int = 8
    keep_checkpoints: int = 3
    seed: int = 0
    num_sample_images: int = 16
    sample_temperature: float = 0.7
    # Anneal plot-time sampling temperature 0 -> sample_temperature over the
    # first N steps (BASELINE.json config 3 "temperature-annealed sampling").
    temperature_anneal_steps: int = 0
    # Polyak averaging of trainable params for eval/sampling (Glow paper
    # practice; 0 disables — the reference lineage has no EMA).
    ema_decay: float = 0.0
    # Random horizontal flips during training (standard density-modelling
    # augmentation for CIFAR/CelebA recipes; the reference lineage has no
    # augmentation).  Applied INSIDE the jitted train step from the saved
    # per-step rng — zero host cost, bitwise-reproducible across resume.
    augment_flip: bool = False
    # Sample-quality tracking: every N steps compute the multi-scale sliced
    # Wasserstein distance (utils/swd.py, PGGAN protocol) between the
    # current training batch and T=1.0 samples from the eval (EMA) params,
    # logged as `swd_x1e3`.  Host-side numpy (~3 s at 256 32² images);
    # 0 disables.
    swd_gap: int = 0
    swd_images: int = 256  # per-set image count (capped by batch_size)
    # Skip optimizer updates with non-finite grads, up to N consecutive
    # (optax.apply_if_finite; Glow-paper practice — affine-coupling scales
    # transiently saturate).  0 disables.  After N consecutive skips optax
    # "gives up and accepts" (poisoning params), so keep N large — the
    # trainer's own guard (3 consecutive non-finite scalar logs) aborts
    # genuinely-stuck runs long before that.
    skip_nonfinite_updates: int = 100
    # Observability / debugging (SURVEY.md §5; no reference counterpart):
    profile_step: int = 0  # start a jax.profiler trace at this step (0 = off)
    profile_num_steps: int = 3
    debug_nans: bool = False  # jax_debug_nans for debug runs
    # Step-liveness watchdog (SURVEY.md §5 failure recovery; field-motivated:
    # a tunneled-TPU RPC wedged mid-dispatch for 50+ min on a round-5 soak —
    # the dispatch never returns, so neither the SIGTERM handler (main thread
    # stuck in C) nor --retries (same process = same wedged client) can act).
    # If the train loop makes no progress for this many seconds AFTER the
    # first completed step, a watchdog thread abandons the process: exit
    # code 17, or under `train.py --retries N` an in-place re-exec (fresh
    # device client) resuming from the latest snapshot, up to N times.
    # 0 disables.  Keep it far above the slowest legitimate loop boundary
    # (first eval/plot jit compiles take minutes on remote Mosaic).
    step_timeout_s: float = 0.0


@dataclass(frozen=True)
class DataConfig:
    """Dataset selection (reference profile section "Data" + dataset/)."""

    name: str = "cifar10"  # cifar10 | celeba | imagenet64 | image_folder
    #                        | synthetic* | any tfds-prepared dataset name
    root: str = ""
    image_size: int = 32
    num_workers: int = 8  # decode threads (native/thread-pool path)
    prefetch: int = 2
    # Host loader: "auto" = Grain for on-disk datasets when available,
    # indexed in-memory fallback otherwise; "native" = never Grain;
    # "grain" = require Grain (error if no source).
    loader: str = "auto"
    # Grain worker PROCESSES (0 = in-process).  Raise on hosts with spare
    # cores so JPEG decode overlaps device compute across processes.
    grain_workers: int = 0


@dataclass(frozen=True)
class MeshConfig:
    """Device mesh for GSPMD (replaces reference "Device" lists)."""

    data: int = -1  # -1: all remaining devices
    model: int = 1

    def shape(self, n_devices: int) -> tuple[int, int]:
        model = max(1, self.model)
        data = self.data if self.data > 0 else n_devices // model
        return (data, model)


@dataclass(frozen=True)
class Profile:
    """One experiment = the reference's whole JSON profile."""

    name: str = "default"
    glow: GlowConfig = field(default_factory=GlowConfig)
    optim: OptimConfig = field(default_factory=OptimConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    data: DataConfig = field(default_factory=DataConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    out_dir: str = "results"

    def replace(self, **kw) -> "Profile":
        return dataclasses.replace(self, **kw)


# ---------------------------------------------------------------------------
# The five driver configs (BASELINE.json "configs") as named presets.
# ---------------------------------------------------------------------------

PRESETS: dict[str, Profile] = {
    "tiny-cifar10": Profile(
        name="tiny-cifar10",
        glow=GlowConfig(image_shape=(32, 32, 3), hidden_channels=128, K=8, L=3),
        train=TrainConfig(batch_size=64),
        data=DataConfig(name="cifar10", image_size=32),
    ),
    "cifar10": Profile(
        name="cifar10",
        glow=GlowConfig(
            image_shape=(32, 32, 3),
            hidden_channels=512,
            K=32,
            L=3,
            compute_dtype="bfloat16",
            invconv_precision="high",
            # Train/serve on the fused flow-step kernels (fwd + hand-derived
            # bwd, ops/flowstep_pallas.py): +49% training throughput over
            # the XLA path on v5e and no K-step coupling residuals in HBM.
            flowstep_impl="pallas",
        ),
        # Held-out eval on: every eval writes eval_nll and the trainer keeps
        # the lowest-bits/dim snapshot in checkpoints-best (model selection
        # for the <=3.4 bits/dim CIFAR-10 north star; docs/REAL_DATA.md).
        # EMA on: the round-4 20k-step hardware soak measured Polyak eval
        # 3.7235 vs raw 3.737 bits/dim at 20k, ahead of raw at EVERY eval
        # from 4k on (docs/BENCHMARKING.md round-4 A/B); swd_gap logs the
        # sample-quality trajectory beside the NLL curve.
        train=TrainConfig(batch_size=256, steps_per_call=5, eval_gap=1000,
                          ema_decay=0.9999, swd_gap=2000,
                          step_timeout_s=1800.0),
        # noam (warmup then inverse-sqrt decay): the round-2 hardware soaks
        # found constant post-warmup lr "reliably diverges" past ~4-6k steps
        # while noam completed 20k steps (docs/BENCHMARKING.md); the 600k-step
        # north-star recipes must not default to the known-fragile schedule.
        optim=OptimConfig(schedule="noam"),
        data=DataConfig(name="cifar10", image_size=32),
    ),
    "celeba64": Profile(
        name="celeba64",
        glow=GlowConfig(
            image_shape=(64, 64, 3),
            hidden_channels=512,
            K=32,
            L=4,
            compute_dtype="bfloat16",
            invconv_precision="high",
            # Fused kernels: 950 vs 639 img/s training on one v5e chip, and
            # b128 fits WITHOUT remat (the XLA path's stored coupling
            # residuals need 28.5 GB and OOM; scripts/bench_train.py).
            flowstep_impl="pallas",
        ),
        # EMA per the round-4 cifar10 soak A/B; temperature-annealed
        # sampling (BASELINE.json config 3) ramps plot-time temperature
        # 0 -> 0.7 over the warmup-scale first 4k steps.
        train=TrainConfig(batch_size=128, sample_temperature=0.7,
                          steps_per_call=5, eval_gap=2000,
                          ema_decay=0.9999, swd_gap=2000,
                          temperature_anneal_steps=4000,
                          step_timeout_s=1800.0),
        optim=OptimConfig(schedule="noam"),  # survivable default (see cifar10)
        data=DataConfig(name="celeba", image_size=64),
    ),
    "imagenet64-cond": Profile(
        name="imagenet64-cond",
        glow=GlowConfig(
            image_shape=(64, 64, 3),
            hidden_channels=512,
            K=48,
            L=4,
            y_condition=True,
            y_classes=1000,
            y_multi_class=False,
            compute_dtype="bfloat16",
            invconv_precision="high",
            flowstep_impl="pallas",
            remat=True,
        ),
        # Held-out eval + best-checkpoint tracking ON (round-2 verdict: the
        # ImageNet north-star config must not train blind).
        train=TrainConfig(batch_size=128, steps_per_call=5, eval_gap=2000,
                          ema_decay=0.9999, swd_gap=2000,
                          step_timeout_s=1800.0),
        optim=OptimConfig(schedule="noam"),  # survivable default (see cifar10)
        data=DataConfig(name="imagenet64", image_size=64),
    ),
    "celebahq256": Profile(
        name="celebahq256",
        glow=GlowConfig(
            image_shape=(256, 256, 3),
            hidden_channels=512,
            K=32,
            L=6,
            n_bits_x=5,
            # Additive coupling at 256² (Glow-paper practice for the
            # largest models).  Measured: affine at this depth diverged to
            # non-finite loss at ~2.7k steps (b8, textured) on BOTH the
            # bf16 fused-kernel arm AND an f32/XLA control resumed from the
            # same snapshot — the instability is the affine scale dynamics,
            # not kernel numerics (ROUND3.md, round-3 soaks).
            flow_coupling="additive",
            compute_dtype="bfloat16",
            invconv_precision="high",
            # Fully-fused training via the halo fwd+bwd kernels (round 3):
            # in-process A/B on v5e b8 measured 36.8 vs 23.1 img/s for the
            # XLA+remat path (+59%); the infeasible deep levels (4²·c384)
            # fall back to the XLA vjp automatically.
            flowstep_impl="pallas",
            remat=True,
            shard_spatial=True,  # H over "model" when mesh.model > 1
        ),
        # steps_per_call=1: chaining the halo kernels in a fori_loop sends
        # the remote Mosaic compile >10 min (docs/BENCHMARKING.md); at
        # ~220 ms/step, async dispatch keeps the chip fed from one step per
        # call anyway.
        train=TrainConfig(batch_size=64, sample_temperature=0.7,
                          steps_per_call=1, eval_gap=2000,
                          ema_decay=0.9999, swd_gap=2000,
                          step_timeout_s=1800.0),
        # lr 1e-4 (not the 64² presets' 1e-3): at 256² the flow is 192 steps
        # deep and training sits at the edge of stability — round-3 soaks
        # measured an oscillatory blow-up (grad-norm doubling per step over
        # ~10 steps at FLAT loss, no parameter drift beforehand) whenever the
        # noam ramp crossed lr ≈ 1.8-2.1e-4, reproducibly at b8 AND b64,
        # additive AND affine coupling, bf16/fused AND f32/XLA (ROUND3.md).
        # Peak 1e-4 keeps a ~2x margin below the measured threshold.
        optim=OptimConfig(lr=1e-4, schedule="noam"),
        data=DataConfig(name="celebahq", image_size=256),
        mesh=MeshConfig(data=-1, model=1),
    ),
}
