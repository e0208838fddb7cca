"""Numerics core: diagonal-Gaussian density math and the bits/dim objective.

TPU-first re-derivation of the reference's Gaussian / objective math
(reference: upstream:network/module.py `GaussianDiag`, upstream:network/model.py
`Glow.normal_flow`; see SURVEY.md §2.1 #11, #17 and §2.4).  Everything here is
a pure function over jnp arrays — no classes, no state — so it composes under
jit/vmap/scan/pjit.

Conventions
-----------
* Layout is NHWC (channels-last) everywhere: TPU convs and reshapes want it.
* `logs` denotes log-standard-deviation (sigma = exp(logs)), matching the
  reference's parameterization.
* All reductions that produce per-example log-likelihoods reduce over the
  (H, W, C) axes and keep the batch axis.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

LOG2PI = math.log(2.0 * math.pi)


def gaussian_likelihood(mean: jax.Array, logs: jax.Array, x: jax.Array) -> jax.Array:
    """Elementwise log N(x; mean, exp(logs)^2).

    lik = -0.5 * (log(2*pi) + 2*logs + (x - mean)^2 / exp(2*logs))
    (reference: upstream:network/module.py `GaussianDiag.likelihood`).
    """
    inv_var = jnp.exp(-2.0 * logs)
    return -0.5 * (LOG2PI + 2.0 * logs + jnp.square(x - mean) * inv_var)


def gaussian_logp(mean: jax.Array, logs: jax.Array, x: jax.Array) -> jax.Array:
    """Per-example log-probability: sum of `gaussian_likelihood` over H,W,C."""
    lik = gaussian_likelihood(mean, logs, x)
    return jnp.sum(lik, axis=tuple(range(1, lik.ndim)))


def gaussian_sample(
    rng: jax.Array,
    mean: jax.Array,
    logs: jax.Array,
    temperature: float | jax.Array = 1.0,
    shape: tuple[int, ...] | None = None,
) -> jax.Array:
    """Temperature sampling: mean + exp(logs) * eps * temperature.

    (reference: upstream:network/module.py `GaussianDiag.sample` with
    `eps_std` as the temperature knob.)
    """
    if shape is None:
        shape = jnp.broadcast_shapes(mean.shape, logs.shape)
    eps = jax.random.normal(rng, shape, dtype=jnp.result_type(mean))
    return mean + jnp.exp(logs) * eps * temperature


def num_dims(shape: tuple[int, ...]) -> int:
    """Dimensionality D = C*H*W of one image (batch axis excluded).

    The reference lineage divides by H*W only; the paper convention (and the
    driver's bits/dim target) divides by C*H*W — we follow the paper, as
    pinned by SURVEY.md §2.4.
    """
    d = 1
    for s in shape[1:]:
        d *= s
    return d


def bits_per_dim(objective: jax.Array, dims: int) -> jax.Array:
    """nll in bits/dim = -objective / (ln 2 * D)."""
    return -objective / (math.log(2.0) * dims)


def discretization_correction(dims: int, n_bins: float) -> float:
    """-D * log(n_bins): converts continuous density to discrete log-mass.

    Added once to the objective (reference: upstream:network/model.py
    `normal_flow`, `logdet += -log(n_bins) * pixels`; here D = C*H*W).
    """
    return -dims * math.log(n_bins)
