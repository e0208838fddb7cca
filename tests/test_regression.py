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
