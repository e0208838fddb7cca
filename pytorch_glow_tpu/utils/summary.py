"""Model summary: parameter counts and an analytic FLOPs-per-image estimate.

No reference counterpart; used by train.py startup logging and the docs'
MFU arithmetic.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np

from pytorch_glow_tpu.config import GlowConfig


def param_count(params: Any) -> int:
    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(params))


def forward_flops_per_image(cfg: GlowConfig) -> int:
    """Analytic MAC*2 count of one forward pass (convs + invconv matmuls).

    Elementwise work (actnorm, sigmoid, prior logp) is negligible and
    excluded; used for MFU estimates, not billing.
    """
    total = 0
    hidden = cfg.hidden_channels
    for h, w, c in cfg.latent_shapes():
        pixels = h * w
        c_half = c // 2
        c_out = c_half if cfg.flow_coupling == "additive" else c
        per_pixel = (
            9 * c_half * hidden  # conv1 3x3
            + hidden * hidden  # conv2 1x1
            + 9 * hidden * c_out  # conv3 3x3
        )
        if cfg.flow_permutation == "invconv":
            per_pixel += c * c
        total += 2 * cfg.K * pixels * per_pixel
        # split prior conv (all but last level handled by caller shape list)
    return total


def summarize(params: Any, cfg: GlowConfig) -> str:
    n = param_count(params)
    gf = forward_flops_per_image(cfg) / 1e9
    return (
        f"Glow K={cfg.K} L={cfg.L} width={cfg.hidden_channels} "
        f"{cfg.image_shape[0]}x{cfg.image_shape[1]}: {n / 1e6:.1f}M params, "
        f"~{gf:.1f} GFLOP/image forward"
    )
