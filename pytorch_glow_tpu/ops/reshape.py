"""Zero-copy tensor-shuffling ops: squeeze (space-to-depth), channel split/cat.

TPU-first equivalents of the reference's view/permute tricks
(reference: upstream:network/module.py `Squeeze2d`, upstream:misc/ops.py
`split_channel`/`cat_channel`; SURVEY.md §2.1 #5, #12).  All functions are
pure reshape/transpose compositions that XLA fuses into surrounding ops —
no data movement kernel is ever emitted for them on TPU.

Layout is NHWC.  The channel ordering after `squeeze2d` matches the
reference's NCHW ordering under the channel-index map
    k = c * factor^2 + s1 * factor + s2
so that cross-framework parity checks can permute axes without reindexing
channels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def squeeze2d(x: jax.Array, factor: int = 2) -> jax.Array:
    """Space-to-depth: (B, H, W, C) -> (B, H/f, W/f, C*f^2); logdet = 0."""
    if factor == 1:
        return x
    b, h, w, c = x.shape
    assert h % factor == 0 and w % factor == 0, (h, w, factor)
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = x.transpose(0, 1, 3, 5, 2, 4)  # (B, H/f, W/f, C, f, f)
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


def unsqueeze2d(z: jax.Array, factor: int = 2) -> jax.Array:
    """Depth-to-space inverse of `squeeze2d`."""
    if factor == 1:
        return z
    b, h, w, c4 = z.shape
    c = c4 // (factor * factor)
    assert c * factor * factor == c4, (c4, factor)
    z = z.reshape(b, h, w, c, factor, factor)
    z = z.transpose(0, 1, 4, 2, 5, 3)  # (B, H, f, W, f, C)
    return z.reshape(b, h * factor, w * factor, c)


def split_channel(x: jax.Array, mode: str = "simple") -> tuple[jax.Array, jax.Array]:
    """Split the channel (last) axis in half.

    "simple": first half / second half (reference calls this "split").
    "cross":  even indices / odd indices.
    """
    c = x.shape[-1]
    if mode in ("simple", "split"):
        return x[..., : c // 2], x[..., c // 2 :]
    if mode == "cross":
        return x[..., 0::2], x[..., 1::2]
    raise ValueError(f"unknown split mode: {mode}")


def cat_channel(a: jax.Array, b: jax.Array, mode: str = "simple") -> jax.Array:
    """Inverse of `split_channel`."""
    if mode in ("simple", "split"):
        return jnp.concatenate([a, b], axis=-1)
    if mode == "cross":
        b_, h, w, c = a.shape
        out = jnp.stack([a, b], axis=-1)  # (B,H,W,C,2)
        return out.reshape(b_, h, w, 2 * c)
    raise ValueError(f"unknown split mode: {mode}")
