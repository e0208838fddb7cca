"""Learning-regression test (SURVEY.md §4: "bits/dim-after-N-steps
regression on the Tiny config"): on highly-compressible smooth synthetic
images the flow must push bits/dim well below the 8 bits/dim noise floor
within a fixed step budget.  Guards against silent optimization/objective
regressions that unit invertibility tests cannot catch."""

import numpy as np

from pytorch_glow_tpu.config import (
    DataConfig,
    GlowConfig,
    OptimConfig,
    Profile,
    TrainConfig,
)
from pytorch_glow_tpu.train import builder as builderlib
from pytorch_glow_tpu.train import trainer as trainerlib


def test_bits_per_dim_after_n_steps(tmp_path):
    p = Profile(
        name="regress",
        glow=GlowConfig(image_shape=(8, 8, 3), hidden_channels=32, K=4, L=2),
        optim=OptimConfig(lr=3e-3, warmup_steps=20),
        train=TrainConfig(
            batch_size=32, num_steps=150, scalar_log_gap=50, plot_gap=0,
            checkpoint_gap=0, seed=0,
        ),
        data=DataConfig(name="synthetic_smooth"),
        out_dir=str(tmp_path),
    )
    built = builderlib.build(p)
    result = trainerlib.train(built, quiet=True)
    assert np.isfinite(result["nll"])
    # Smooth gradients carry ~2-4 bits/dim of true entropy; an 8-bit-floor
    # result means the model learned nothing.
    assert result["nll"] < 6.0, result


def test_bits_per_dim_textured_family(tmp_path):
    """The HARDER synthetic quality bar (round-2 verdict #7): multi-scale
    Gaussian textures + occluding shapes carry real structure at several
    scales (PNG-estimated ~5.2 bits/subpixel vs ~3.9 for smooth gradients),
    so learning progress stays measurable where smooth-synthetic saturates.
    300 tiny-config steps must pull bits/dim clearly off the 8.0 noise
    floor; the paper-scale TPU curve is documented in docs/BENCHMARKING.md."""
    p = Profile(
        name="regress-tex",
        glow=GlowConfig(image_shape=(8, 8, 3), hidden_channels=32, K=4, L=2),
        optim=OptimConfig(lr=3e-3, warmup_steps=20),
        train=TrainConfig(
            batch_size=32, num_steps=300, scalar_log_gap=100, plot_gap=0,
            checkpoint_gap=0, seed=0,
        ),
        data=DataConfig(name="synthetic_textured"),
        out_dir=str(tmp_path),
    )
    built = builderlib.build(p)
    result = trainerlib.train(built, quiet=True)
    assert np.isfinite(result["nll"])
    # Probe on this config measured 6.06 bits/dim at step 300 (2026-08-17);
    # the band below catches "learned nothing" (≈8.0) and degenerate
    # collapse while allowing XLA-version noise.
    assert 3.0 < result["nll"] < 6.8, result


def test_golden_nll_values():
    """Golden-number guard: fixed seeds + DDI -> exact bits/dim values.

    Catches silent numerics drift (objective terms, DDI, layer math) that
    invertibility tests cannot see.  Tolerance allows minor XLA-version
    noise; a real objective change moves these by whole units.
    """
    import jax
    import jax.numpy as jnp

    from pytorch_glow_tpu.config import GlowConfig
    from pytorch_glow_tpu.models import glow

    cfg = GlowConfig(image_shape=(8, 8, 3), hidden_channels=16, K=2, L=2)
    params = glow.init_glow(jax.random.key(42), cfg)
    u8 = jax.random.randint(jax.random.key(7), (4, 8, 8, 3), 0, 256, jnp.uint8)
    x = glow.preprocess(u8, cfg)
    params = glow.ddi_init(params, x, cfg)
    nll = np.asarray(glow.log_prob(params, x, cfg)["nll"])
    golden = np.array([8.15714, 8.21657, 8.1152, 8.17326])
    np.testing.assert_allclose(nll, golden, rtol=1e-3)
