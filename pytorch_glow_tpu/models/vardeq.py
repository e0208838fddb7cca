"""Variational dequantization: a learned q(u|x) instead of uniform noise.

Beyond-reference scope (the reference pins uniform dequantization,
SURVEY.md §2.4): following Flow++ (Ho et al. 2019, arXiv:1902.00275 §3.1),
learning the dequantization distribution tightens the discrete
log-likelihood bound — Flow++'s ablation attributes ~0.06-0.1 bits/dim of
its CIFAR-10 gain to this alone.  Sampling, reconstruction, and the exact
round-trip are untouched: q only shapes the training-time noise.

Math.  P(x) = ∫_{[0,1)^D} p(x + u/n_bins) · n_bins^{-D} du, so for any
density q(u|x) on (0,1)^D (Jensen):

    log P(x) ≥ E_{u~q}[ log p(x + u/n_bins) ] − D·log n_bins − E_q[log q(u|x)]

Uniform q recovers the standard objective (log q ≡ 0).  The pipeline
already carries −D·log n_bins (``discretization_correction``) and the
first term (encode of x + noise); this module contributes the noise sample
u and the −log q(u|x) correction term.

Design (TPU-first, exact-at-init):

    ε ~ Logistic(0,1)      # NOT normal: σ(ε) is exactly U(0,1), so the
                           # zero-init flow reproduces uniform dequant
                           # BIT-FOR-BIT at init (locked by a test)
    w = flow(ε; ctx(x))    # K additive couplings + zero-init global affine
    u = σ(w)
    log q(u|x) = log p_L(ε) − logdet_flow − Σ log σ′(w)

where log p_L(ε) = log σ′(ε) (the Logistic(0,1) density).  The flow runs
on squeeze2d'd tensors (C→4C at H/2) so channel-split couplings see ≥6
channels even for RGB inputs; context features (two 3×3 convs over
squeeze2d(x)) are computed once and concatenated into every coupling's
input.  Couplings are additive with zero-init output convs, so the whole
flow is EXACTLY the identity at init and only training can move the bound.
Everything runs in f32: at paper scale the q-flow is <1% of model FLOPs,
so there is nothing to win from bf16 here.

Only the forward direction of q's flow is ever needed (we sample u and
evaluate its density along the way) — no reverse path exists or is tested.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.models import layers as L
from pytorch_glow_tpu.ops.reshape import cat_channel, split_channel, squeeze2d, unsqueeze2d

Params = dict[str, Any]


def _log_dsigmoid(v: jax.Array) -> jax.Array:
    """log σ′(v) = log σ(v) + log σ(−v), stable at any |v|."""
    return jax.nn.log_sigmoid(v) + jax.nn.log_sigmoid(-v)


def vardeq_init(rng: jax.Array, cfg: GlowConfig) -> Params:
    _, _, c = cfg.image_shape
    cs = 4 * c  # channels after squeeze2d
    ctx_w = cfg.vardeq_context_width
    r1, r2, *r_steps = jax.random.split(rng, 2 + cfg.vardeq_steps)
    return {
        "ctx": {
            "conv1": L.conv2d_init(r1, cs, ctx_w, (3, 3)),
            "conv2": L.conv2d_init(r2, ctx_w, ctx_w, (3, 3)),
        },
        "steps": tuple(
            L.coupling_net_init(r, cs // 2 + ctx_w, cfg.vardeq_width, cs // 2)
            for r in r_steps
        ),
        "final": {
            "bias": jnp.zeros((cs,), jnp.float32),
            "logs": jnp.zeros((cs,), jnp.float32),
        },
    }


def _context(params: Params, x: jax.Array) -> jax.Array:
    h = squeeze2d(x.astype(jnp.float32), 2)
    h, _ = L.conv2d_forward(params["conv1"], h)
    h = jax.nn.relu(h)
    h, _ = L.conv2d_forward(params["conv2"], h)
    return jax.nn.relu(h)


def vardeq_apply(
    params: Params, rng: jax.Array, x: jax.Array, cfg: GlowConfig
) -> tuple[jax.Array, jax.Array]:
    """Sample x_deq = x + u/n_bins with u ~ q(u|x).

    Returns (x_deq, −log q(u|x)) — add the second term to the flow
    objective (it is exactly 0 under uniform q, i.e. at init)."""
    # ε ~ Logistic(0,1) via inverse-CDF of U(0,1); the clip bounds keep
    # logit finite (±~11.5) without visibly truncating the distribution.
    u0 = jax.random.uniform(rng, x.shape, jnp.float32, 1e-5, 1.0 - 1e-5)
    eps = jnp.log(u0) - jnp.log1p(-u0)
    axes = tuple(range(1, x.ndim))

    w = squeeze2d(eps, 2)
    # `base` rides through the SAME channel flips as `w` so that at the
    # flow's zero-init the base Logistic log-density and the final
    # −Σ log σ′(w) term are sums over bitwise-identical arrays in identical
    # order — they cancel EXACTLY, making q uniform bit-for-bit at init.
    base = w
    ctx = _context(params["ctx"], x)
    for i, net in enumerate(params["steps"]):
        if i % 2:
            # Alternate which half is transformed (fixed channel flip;
            # volume-preserving, and q needs no reverse path).
            w = jnp.flip(w, axis=-1)
            base = jnp.flip(base, axis=-1)
        w1, w2 = split_channel(w, "simple")
        h, _ = L.coupling_net_forward(net, jnp.concatenate([w1, ctx], axis=-1))
        w = cat_channel(w1, w2 + h, "simple")
    f = params["final"]
    w = w * jnp.exp(f["logs"]) + f["bias"]
    n_pix = w.shape[1] * w.shape[2]
    # Subtract the base Logistic density and the −Σ log σ′(w) term
    # ELEMENTWISE before reducing: at zero-init `base` and `w` are bitwise
    # identical, so the difference is exactly 0 per element and the sum is
    # exactly 0 under ANY reduction order — including GSPMD-sharded partial
    # sums (a summed-separately version left ~1e-7 residuals on a mesh).
    log_q = jnp.sum(_log_dsigmoid(base) - _log_dsigmoid(w), axis=axes)
    log_q = log_q - n_pix * jnp.sum(f["logs"])  # − logdet of the flow

    u = unsqueeze2d(jax.nn.sigmoid(w), 2)
    return x + u / cfg.n_bins, -log_q
