"""pytorch_glow_tpu — a TPU-native Glow (normalizing flow) framework.

From-scratch JAX/XLA/Pallas/pjit rebuild with the capabilities of the
PyTorch reference `corenel/pytorch-glow` (see SURVEY.md): multi-scale Glow
(L levels x K steps of actnorm -> invertible 1x1 conv -> coupling),
bidirectional NLL + temperature sampling, data-dependent actnorm init,
training/inference runtimes, GSPMD data parallelism over a TPU mesh, and a
Pallas kernel for the LU-parameterized 1x1 conv.
"""

from pytorch_glow_tpu.config import (
    DataConfig,
    GlowConfig,
    MeshConfig,
    OptimConfig,
    PRESETS,
    Profile,
    TrainConfig,
)
from pytorch_glow_tpu.models.glow import (
    ddi_init,
    decode,
    encode,
    init_glow,
    log_prob,
    loss_fn,
    postprocess,
    preprocess,
    reconstruct,
    sample,
)

__version__ = "0.1.0"

__all__ = [
    "DataConfig",
    "GlowConfig",
    "MeshConfig",
    "OptimConfig",
    "PRESETS",
    "Profile",
    "TrainConfig",
    "ddi_init",
    "decode",
    "encode",
    "init_glow",
    "log_prob",
    "loss_fn",
    "postprocess",
    "preprocess",
    "reconstruct",
    "sample",
]
