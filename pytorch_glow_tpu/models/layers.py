"""Invertible flow layers as pure functions over param pytrees.

TPU-native re-design of the reference's module zoo (reference:
upstream:network/module.py — ActNorm2d, InvertibleConv1x1, Permutation2d,
Conv2d, Conv2dZeros, LinearZeros, Split2d, Squeeze2d; SURVEY.md §2.1 #7-#13).

Design rules (not a port):
* No classes, no mutable state.  Each layer is a set of pure functions:
      init(rng, ...) -> params            (host, once)
      forward(params, x, logdet, ddi) -> (z, logdet, new_params_or_None)
      reverse(params, z, ...) -> x
  so layers compose under jit / lax.scan / pjit, and the K flow steps of a
  level run as ONE compiled scan body over stacked params.
* ActNorm's data-dependent init (the reference's non-jittable first-forward
  side effect, SURVEY.md §3.4) is the static `ddi: bool` flag: with ddi=True
  the same forward code computes batch statistics, uses them, and returns
  the would-be params.  One jitted pass over a host batch initializes every
  actnorm in depth order — including the ones buried inside coupling-net
  conv wrappers.  Batch reductions are global under pjit, so DDI is
  replica-consistent for free.
* Layout NHWC; params f32; the invertible 1x1 conv and all logdet math run
  f32/HIGHEST (see ops/invconv_xla.py).  Coupling-net convs may run bf16.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from pytorch_glow_tpu.ops import invconv_xla as ic
from pytorch_glow_tpu.ops.math import gaussian_logp, gaussian_sample
from pytorch_glow_tpu.ops.reshape import cat_channel, split_channel

Params = dict[str, Any]

ACTNORM_EPS = 1e-6
LOGSCALE_FACTOR = 3.0  # Conv2dZeros / LinearZeros output scaling (reference)


# ---------------------------------------------------------------------------
# ActNorm
# ---------------------------------------------------------------------------


def actnorm_init(c: int) -> Params:
    """Zero init; real values come from the DDI pass."""
    return {
        "bias": jnp.zeros((c,), jnp.float32),
        "logs": jnp.zeros((c,), jnp.float32),
    }


def _actnorm_ddi_params(x: jax.Array, scale: float) -> Params:
    """Data-dependent init: bias = -mean, logs = log(scale / (std + eps)).

    Reductions over (B, H, W) — under pjit with the batch sharded these are
    global psums, so every replica derives identical params.
    """
    axes = tuple(range(x.ndim - 1))
    x32 = x.astype(jnp.float32)
    mean = jnp.mean(x32, axis=axes)
    var = jnp.mean(jnp.square(x32 - mean), axis=axes)
    std = jnp.sqrt(var)
    return {
        "bias": -mean,
        "logs": jnp.log(scale / (std + ACTNORM_EPS)),
    }


def actnorm_forward(
    params: Params,
    x: jax.Array,
    logdet: jax.Array | None,
    ddi: bool = False,
    scale: float = 1.0,
) -> tuple[jax.Array, jax.Array | None, Params | None]:
    """y = (x + bias) * exp(logs); logdet += H*W * sum(logs)."""
    new_params = None
    if ddi:
        new_params = _actnorm_ddi_params(x, scale)
        params = new_params
    bias = params["bias"].astype(x.dtype)
    logs = params["logs"].astype(x.dtype)
    y = (x + bias) * jnp.exp(logs)
    if logdet is not None:
        pixels = x.shape[1] * x.shape[2]
        logdet = logdet + pixels * jnp.sum(params["logs"])
    return y, logdet, new_params


def actnorm_reverse(params: Params, y: jax.Array) -> jax.Array:
    """x = y * exp(-logs) - bias."""
    bias = params["bias"].astype(y.dtype)
    logs = params["logs"].astype(y.dtype)
    return y * jnp.exp(-logs) - bias


# ---------------------------------------------------------------------------
# Conv wrappers (coupling-net internals; not bijectors, no logdet)
# ---------------------------------------------------------------------------


def conv2d_init(
    rng: jax.Array, c_in: int, c_out: int, kernel: tuple[int, int] = (3, 3)
) -> Params:
    """N(0, 0.05) weights, output-actnorm instead of bias (reference Conv2d)."""
    w = 0.05 * jax.random.normal(rng, (*kernel, c_in, c_out), dtype=jnp.float32)
    return {"w": w, "actnorm": actnorm_init(c_out)}


def conv2d_forward(
    params: Params, x: jax.Array, ddi: bool = False
) -> tuple[jax.Array, Params | None]:
    y = jax.lax.conv_general_dilated(
        x,
        params["w"].astype(x.dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y, _, new_an = actnorm_forward(params["actnorm"], y, None, ddi=ddi)
    new_params = {"w": params["w"], "actnorm": new_an} if ddi else None
    return y, new_params


def conv2d_zeros_init(c_in: int, c_out: int, kernel: tuple[int, int] = (3, 3)) -> Params:
    """Zero weights/bias + per-channel logs: the layer starts as identity-0.

    Output is scaled by exp(logs * 3) (reference Conv2dZeros) — this is what
    makes every flow step the identity map at init (SURVEY.md §2.4).
    """
    return {
        "w": jnp.zeros((*kernel, c_in, c_out), jnp.float32),
        "b": jnp.zeros((c_out,), jnp.float32),
        "logs": jnp.zeros((c_out,), jnp.float32),
    }


def conv2d_zeros_forward(
    params: Params, x: jax.Array, compute_dtype: jnp.dtype = jnp.float32
) -> jax.Array:
    """Zero-init conv; inputs/weights may run bf16 for MXU throughput but
    accumulation and the exp-scaled output are always f32 (the output feeds
    shift/scale/logdet math).  Coupling invertibility is unaffected by the
    compute dtype: forward and reverse evaluate the identical function."""
    y = jax.lax.conv_general_dilated(
        x.astype(compute_dtype),
        params["w"].astype(compute_dtype),
        window_strides=(1, 1),
        padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    # Upcast AFTER the conv (TPU convs accumulate f32 internally either way;
    # preferred_element_type here would make the autodiff transpose conv
    # mixed-dtype and fail to lower).
    y = y.astype(jnp.float32) + params["b"]
    return y * jnp.exp(params["logs"] * LOGSCALE_FACTOR)


def linear_zeros_init(d_in: int, d_out: int) -> Params:
    return {
        "w": jnp.zeros((d_in, d_out), jnp.float32),
        "b": jnp.zeros((d_out,), jnp.float32),
        "logs": jnp.zeros((d_out,), jnp.float32),
    }


def linear_zeros_forward(params: Params, x: jax.Array) -> jax.Array:
    y = x @ params["w"].astype(x.dtype) + params["b"].astype(x.dtype)
    return y * jnp.exp(params["logs"].astype(y.dtype) * LOGSCALE_FACTOR)


# ---------------------------------------------------------------------------
# Channel permutations: invertible 1x1 conv / shuffle / reverse
# ---------------------------------------------------------------------------


def permutation_kind(mode: str, lu_decomposed: bool) -> str:
    """Static param-structure selector: "lu" | "plain" | "fixed"."""
    if mode == "invconv":
        return "lu" if lu_decomposed else "plain"
    if mode in ("shuffle", "reverse"):
        return "fixed"
    raise ValueError(f"unknown permutation mode: {mode}")


def permutation_init(
    rng: jax.Array, c: int, mode: str, lu_decomposed: bool = True
) -> Params:
    """mode in {"invconv", "shuffle", "reverse"} (reference flow_permutation).

    The kind is NOT stored in the params (it is static config): params must
    stay a pure array pytree so K steps stack for `lax.scan`.
    """
    kind = permutation_kind(mode, lu_decomposed)
    if kind == "lu":
        return {"lu": ic.lu_init(rng, c)}
    if kind == "plain":
        return {"w": ic.random_rotation(rng, c)}
    if mode == "shuffle":
        idx = jax.random.permutation(rng, c)
    else:  # reverse
        idx = jnp.arange(c - 1, -1, -1)
    return {"idx": idx, "inv_idx": jnp.argsort(idx)}


def permutation_forward(
    params: Params, x: jax.Array, logdet: jax.Array | None, kind: str,
    impl: str = "xla", precision: str = "highest",
) -> tuple[jax.Array, jax.Array | None]:
    pixels = x.shape[1] * x.shape[2]
    if kind == "fixed":
        # One-hot matmul instead of a traced channel gather: the idx vector
        # is scan-carried (traced), and dynamic gathers on the channel axis
        # are slow on TPU; a 0/1 matmul rides the MXU.  HIGHEST precision so
        # the permutation stays bit-exact on TPU (default precision would
        # round activations through bf16).
        pmat = jax.nn.one_hot(params["idx"], x.shape[-1], dtype=x.dtype)
        return (
            jnp.einsum("...i,ji->...j", x, pmat, precision=jax.lax.Precision.HIGHEST),
            logdet,
        )
    if kind == "lu":
        if impl == "pallas":
            from pytorch_glow_tpu.ops import invconv_pallas as icp

            y, ld = icp.invconv_lu_forward(x, params["lu"], precision)
            if logdet is not None:
                logdet = logdet + pixels * ld
            return y, logdet
        w = ic.lu_assemble(params["lu"])
        y = ic.mix_channels(x, w, ic.PRECISIONS[precision]).astype(x.dtype)
        if logdet is not None:
            logdet = logdet + pixels * ic.lu_logdet(params["lu"])
        return y, logdet
    # plain
    w = params["w"]
    y = ic.mix_channels(x, w, ic.PRECISIONS[precision]).astype(x.dtype)
    if logdet is not None:
        logdet = logdet + pixels * jnp.linalg.slogdet(w)[1]
    return y, logdet


def permutation_reverse(
    params: Params, z: jax.Array, kind: str, impl: str = "xla",
    precision: str = "highest",
) -> jax.Array:
    if kind == "fixed":
        pmat = jax.nn.one_hot(params["inv_idx"], z.shape[-1], dtype=z.dtype)
        return jnp.einsum(
            "...i,ji->...j", z, pmat, precision=jax.lax.Precision.HIGHEST
        )
    if kind == "lu":
        if impl == "pallas":
            from pytorch_glow_tpu.ops import invconv_pallas as icp

            return icp.invconv_lu_reverse(z, params["lu"])
        w_inv = ic.lu_inverse(params["lu"])
        return ic.mix_channels(z, w_inv, ic.PRECISIONS[precision]).astype(z.dtype)
    w_inv = jnp.linalg.inv(params["w"])
    return ic.mix_channels(z, w_inv, ic.PRECISIONS[precision]).astype(z.dtype)


# ---------------------------------------------------------------------------
# Coupling network f: Conv(3x3) -> ReLU -> Conv(1x1) -> ReLU -> ConvZeros(3x3)
# ---------------------------------------------------------------------------


def coupling_net_init(rng: jax.Array, c_in: int, hidden: int, c_out: int) -> Params:
    r1, r2 = jax.random.split(rng)
    return {
        "conv1": conv2d_init(r1, c_in, hidden, (3, 3)),
        "conv2": conv2d_init(r2, hidden, hidden, (1, 1)),
        "conv3": conv2d_zeros_init(hidden, c_out, (3, 3)),
    }


def coupling_net_forward(
    params: Params,
    x: jax.Array,
    ddi: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, Params | None]:
    """The f() net (reference: upstream:network/model.py `f`).

    Runs in `compute_dtype` (bf16 on TPU for MXU throughput); the zero-init
    output conv returns f32 so shift/scale and logdet stay full-precision.
    """
    h = x.astype(compute_dtype)
    h, an1 = conv2d_forward(params["conv1"], h, ddi=ddi)
    h = jax.nn.relu(h)
    h, an2 = conv2d_forward(params["conv2"], h, ddi=ddi)
    h = jax.nn.relu(h)
    out = conv2d_zeros_forward(params["conv3"], h, compute_dtype=compute_dtype)
    new_params = (
        {"conv1": an1, "conv2": an2, "conv3": params["conv3"]} if ddi else None
    )
    return out, new_params


def coupling_forward(
    params: Params,
    x: jax.Array,
    logdet: jax.Array | None,
    mode: str,
    ddi: bool = False,
    compute_dtype: jnp.dtype = jnp.float32,
) -> tuple[jax.Array, jax.Array | None, Params | None]:
    """Additive or affine coupling (reference FlowStep coupling arm).

    affine: (shift, raw) = split_cross(f(z1)); scale = sigmoid(raw + 2);
            z2 = (z2 + shift) * scale; logdet += sum(log(scale)).
    """
    z1, z2 = split_channel(x, "simple")
    h, new_net = coupling_net_forward(params, z1, ddi=ddi, compute_dtype=compute_dtype)
    if mode == "additive":
        z2 = z2 + h.astype(z2.dtype)
    else:
        shift, raw = split_channel(h, "cross")
        scale = jax.nn.sigmoid(raw + 2.0)
        z2 = (z2 + shift.astype(z2.dtype)) * scale.astype(z2.dtype)
        if logdet is not None:
            # log_sigmoid, NOT log(sigmoid(x)): same value, but the naive
            # composition's gradient is (g/s)*s*(1-s) -> inf*0 = NaN once a
            # scale saturates to 0; log_sigmoid's gradient is g*(1-s),
            # finite everywhere (hit at step ~5k of a hardware soak).
            logdet = logdet + jnp.sum(
                jax.nn.log_sigmoid(raw + 2.0), axis=tuple(range(1, scale.ndim))
            )
    return cat_channel(z1, z2, "simple"), logdet, new_net


def coupling_reverse(
    params: Params,
    z: jax.Array,
    mode: str,
    compute_dtype: jnp.dtype = jnp.float32,
) -> jax.Array:
    z1, z2 = split_channel(z, "simple")
    h, _ = coupling_net_forward(params, z1, ddi=False, compute_dtype=compute_dtype)
    if mode == "additive":
        z2 = z2 - h.astype(z2.dtype)
    else:
        shift, raw = split_channel(h, "cross")
        scale = jax.nn.sigmoid(raw + 2.0)
        z2 = z2 / scale.astype(z2.dtype) - shift.astype(z2.dtype)
    return cat_channel(z1, z2, "simple")


# ---------------------------------------------------------------------------
# Split2d: factor out half the channels against a learned conditional prior
# ---------------------------------------------------------------------------


def split2d_init(c: int) -> Params:
    """Conv2dZeros(C/2 -> C) producing (mean, logs) for the factored-out half."""
    return {"prior_conv": conv2d_zeros_init(c // 2, c, (3, 3))}


def split2d_prior(params: Params, z1: jax.Array) -> tuple[jax.Array, jax.Array]:
    h = conv2d_zeros_forward(params["prior_conv"], z1.astype(jnp.float32))
    return split_channel(h, "cross")


def split2d_forward(
    params: Params, x: jax.Array, logdet: jax.Array
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Returns (z1, logdet + logp(z2), z2)."""
    z1, z2 = split_channel(x, "simple")
    mean, logs = split2d_prior(params, z1)
    logdet = logdet + gaussian_logp(mean, logs, z2.astype(jnp.float32))
    return z1, logdet, z2


def split2d_reverse(
    params: Params,
    z1: jax.Array,
    rng: jax.Array | None,
    temperature: float | jax.Array = 1.0,
    z2: jax.Array | None = None,
) -> jax.Array:
    """Re-sample (or re-attach) the factored-out half and concatenate."""
    if z2 is None:
        mean, logs = split2d_prior(params, z1)
        z2 = gaussian_sample(rng, mean, logs, temperature).astype(z1.dtype)
    return cat_channel(z1, z2, "simple")
