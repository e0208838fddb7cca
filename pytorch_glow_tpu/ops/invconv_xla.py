"""Invertible 1x1 convolution math — XLA path (the correctness reference).

The reference computes `torch.slogdet(W)` every forward and `torch.inverse(W)`
every reverse in its plain mode, and a P*L*(U+diag(s)) reconstruction in LU
mode (reference: upstream:network/module.py `InvertibleConv1x1`; SURVEY.md
§2.1 #8).  On TPU we treat the 1x1 conv as a channel-mixing matmul over the
flattened (B*H*W, C) pixel batch:

* forward:  y = x @ W^T            logdet += H*W * log|det W|
* reverse:  x = y @ (W^{-1})^T

LU mode never materializes a matrix inverse on the hot path: `log|det W|` is
just sum(log_s) and the reverse uses two triangular solves (computed once per
call on the CxC matrix, then a single matmul over pixels — C is <= a few
hundred, pixels are millions, so the solve cost is noise).

All matmuls here run at `precision=HIGHEST` in f32: the logdet feeds the NLL
and the inverse must round-trip to float tolerance (north-star requirement).

A Pallas kernel (ops/invconv_pallas.py) fuses the LU reconstruction with the
pixel matmul; this module is the always-correct fallback it is parity-tested
against.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

HIGHEST = jax.lax.Precision.HIGHEST


class LUParams(NamedTuple):
    """LU-parameterized weight: W = P @ L @ (U + diag(sign_s * exp(log_s))).

    p_idx, sign_s are fixed (non-trainable); l_raw, u_raw, log_s are trained.
    l_raw contributes only its strictly-lower part (unit diagonal added);
    u_raw only its strictly-upper part.
    """

    p_idx: jax.Array  # (C,) int32 — row permutation: P @ M == M[p_idx]
    l_raw: jax.Array  # (C, C) f32
    u_raw: jax.Array  # (C, C) f32
    log_s: jax.Array  # (C,)   f32
    sign_s: jax.Array  # (C,)  f32, +-1


def random_rotation(rng: jax.Array, c: int) -> jax.Array:
    """Random orthonormal init via QR of a standard normal (reference init)."""
    w = jax.random.normal(rng, (c, c), dtype=jnp.float32)
    q, r = jnp.linalg.qr(w)
    # Sign-fix so the distribution is Haar (and det is well-behaved).
    q = q * jnp.sign(jnp.diag(r))[None, :]
    return q


def lu_init(rng: jax.Array, c: int) -> LUParams:
    """Decompose a random rotation into fixed-P LU factors (host-side, once)."""
    w0 = np.asarray(random_rotation(rng, c), dtype=np.float64)
    # Plain Doolittle LU with partial pivoting (numpy has no lu(); scipy-free).
    a = w0.copy()
    perm = np.arange(c)
    for k in range(c - 1):
        piv = k + int(np.argmax(np.abs(a[k:, k])))
        if piv != k:
            a[[k, piv]] = a[[piv, k]]
            perm[[k, piv]] = perm[[piv, k]]
        a[k + 1 :, k] /= a[k, k]
        a[k + 1 :, k + 1 :] -= np.outer(a[k + 1 :, k], a[k, k + 1 :])
    l = np.tril(a, -1)
    u = np.triu(a)
    s = np.diag(u).copy()
    # p_idx maps: W[perm_inv] = L @ U  =>  W = (L@U)[p_idx] with p_idx s.t.
    # applying row-gather by p_idx permutes rows back.
    p_idx = np.empty(c, dtype=np.int32)
    p_idx[perm] = np.arange(c, dtype=np.int32)
    return LUParams(
        p_idx=jnp.asarray(p_idx),
        l_raw=jnp.asarray(l, dtype=jnp.float32),
        u_raw=jnp.asarray(np.triu(u, 1), dtype=jnp.float32),
        log_s=jnp.asarray(np.log(np.abs(s)), dtype=jnp.float32),
        sign_s=jnp.asarray(np.sign(s), dtype=jnp.float32),
    )


def lu_assemble(p: LUParams) -> jax.Array:
    """Reconstruct W (f32, CxC) from the LU factors."""
    c = p.log_s.shape[0]
    l = jnp.tril(p.l_raw, -1) + jnp.eye(c, dtype=jnp.float32)
    u = jnp.triu(p.u_raw, 1) + jnp.diag(p.sign_s * jnp.exp(p.log_s))
    lu = jnp.matmul(l, u, precision=HIGHEST)
    return lu[p.p_idx]  # row-permute: W = P @ L @ U'


def lu_logdet(p: LUParams) -> jax.Array:
    """log|det W| = sum(log_s) — free, no decomposition on the hot path."""
    return jnp.sum(p.log_s)


def lu_inverse(p: LUParams) -> jax.Array:
    """W^{-1} = U'^{-1} L^{-1} P^T via two CxC triangular solves."""
    c = p.log_s.shape[0]
    l = jnp.tril(p.l_raw, -1) + jnp.eye(c, dtype=jnp.float32)
    u = jnp.triu(p.u_raw, 1) + jnp.diag(p.sign_s * jnp.exp(p.log_s))
    eye = jnp.eye(c, dtype=jnp.float32)
    l_inv = jax.scipy.linalg.solve_triangular(l, eye, lower=True, unit_diagonal=True)
    w_inv_pt = jax.scipy.linalg.solve_triangular(u, l_inv, lower=False)
    # W^{-1} = (U'^{-1} L^{-1}) P^T: P^T as column-permute by p_idx.
    return _apply_pt(w_inv_pt, p.p_idx)


def _apply_pt(m: jax.Array, p_idx: jax.Array) -> jax.Array:
    """Right-multiply by P^T where (P @ M) == M[p_idx]:  M @ P^T == M[:, p_idx]."""
    return m[:, p_idx]


PRECISIONS = {
    "highest": jax.lax.Precision.HIGHEST,  # 6-pass f32 (exact parity)
    "high": jax.lax.Precision.HIGH,  # 3-pass (bf16x6-ish), ~2x faster on MXU
    "default": jax.lax.Precision.DEFAULT,  # 1-pass bf16 (throughput mode)
}


def mix_channels(
    x: jax.Array, w: jax.Array, precision: jax.lax.Precision = HIGHEST
) -> jax.Array:
    """y[..., j] = sum_i x[..., i] * w[j, i]  (i.e. y = x @ W^T).

    Works on any (..., C) array; XLA maps the flattened pixel batch onto the
    MXU directly.  f32 HIGHEST by default: the logdet and the exact
    round-trip depend on this matmul's accuracy.
    """
    return jnp.einsum("...i,ji->...j", x.astype(jnp.float32), w, precision=precision)
