"""Inferer: encode / decode / sample / attribute manipulation / interpolation.

Reference surface (upstream:network/inferer.py; SURVEY.md §2.1 #20, §3.2):
encode(img)->z, decode(z)->img, sample(n, eps_std), compute_attribute_delta
over a dataset (mean z with-attr minus without-attr, persisted to disk),
apply_attribute_delta(z, i, strength), and latent interpolation.

TPU-native shape: every heavy path is one jitted pure function; the Inferer
object only carries params + compiled callables.  Two latent views exist:

* `encode`/`decode`  — the final-level latent z_L only (what attribute
  manipulation operates on); decode re-samples split halves from their
  learned priors at `temperature` (the reference's eps_std semantics).
* `encode_full`/`decode_full` — z_L plus every Split2d half: the exact
  round-trip used for reconstruction parity.
"""

from __future__ import annotations

import functools
import os
from collections.abc import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.models import glow


class Inferer:
    def __init__(self, params, cfg: GlowConfig):
        self.params = params
        self.cfg = cfg

        def _prep(x):
            if x.dtype == jnp.uint8:
                x = glow.preprocess(x, cfg)
            return x

        @jax.jit
        def _encode(params, x):
            z, _, _, _ = glow.encode(params, _prep(x), cfg)
            return z

        @jax.jit
        def _encode_full(params, x):
            z, _, z_splits, _ = glow.encode(params, _prep(x), cfg)
            return z, z_splits

        @jax.jit
        def _decode(params, z, rng, temperature):
            x = glow.decode(params, z, cfg, rng=rng, temperature=temperature)
            return glow.postprocess(x, cfg)

        @jax.jit
        def _decode_full(params, z, z_splits):
            x = glow.decode(params, z, cfg, z_splits=z_splits)
            return glow.postprocess(x, cfg)

        @jax.jit
        def _nll(params, x, y_onehot=None):
            return glow.log_prob(params, _prep(x), cfg, y_onehot=y_onehot)["nll"]

        @functools.partial(jax.jit, static_argnames=("samples", "bound"))
        def _nll_bound(params, x, rng, samples, bound, y_onehot=None):
            return glow.nll_bound(
                params, _prep(x), cfg, rng, samples=samples, bound=bound,
                y_onehot=y_onehot,
            )

        self._encode = _encode
        self._encode_full = _encode_full
        self._decode = _decode
        self._decode_full = _decode_full
        self._nll = _nll
        self._nll_bound = _nll_bound

    # -- core ---------------------------------------------------------------

    def encode(self, images) -> jax.Array:
        """images uint8/float NHWC -> final-level latent z_L."""
        return self._encode(self.params, jnp.asarray(images))

    def decode(self, z, rng=None, temperature: float = 0.0) -> np.ndarray:
        """z_L -> uint8 images; split halves drawn at `temperature`
        (0.0 = prior means, deterministic)."""
        rng = rng if rng is not None else jax.random.key(0)
        return np.asarray(self._decode(self.params, z, rng, temperature))

    def encode_full(self, images):
        return self._encode_full(self.params, jnp.asarray(images))

    def decode_full(self, z, z_splits) -> np.ndarray:
        return np.asarray(self._decode_full(self.params, z, z_splits))

    def reconstruct(self, images) -> np.ndarray:
        z, z_splits = self.encode_full(images)
        return self.decode_full(z, z_splits)

    def sample(self, n: int, temperature: float = 0.7, rng=None, y_onehot=None) -> np.ndarray:
        rng = rng if rng is not None else jax.random.key(0)
        imgs = glow.sample(self.params, rng, self.cfg, n=n, temperature=temperature,
                           y_onehot=y_onehot)
        return np.asarray(glow.postprocess(imgs, self.cfg))

    def nll(self, images, y_onehot=None) -> np.ndarray:
        """Noise-free NLL at the bin corner (the reference lineage's eval
        convention; fine for relative comparisons, NOT a discrete-NLL
        bound — use `nll_bound` for publishable numbers)."""
        return np.asarray(self._nll(self.params, jnp.asarray(images), y_onehot))

    def nll_bound(
        self, images, samples: int = 1, bound: str = "elbo", rng=None,
        y_onehot=None,
    ) -> np.ndarray:
        """Valid Monte-Carlo bound on the discrete NLL (bits/dim per image):
        samples=1, bound="elbo" is the standard published protocol; larger
        `samples` with bound="iwae" tightens toward the true log P(x)."""
        rng = rng if rng is not None else jax.random.key(0)
        return np.asarray(
            self._nll_bound(
                self.params, jnp.asarray(images), rng, samples, bound, y_onehot
            )
        )

    # -- attribute manipulation (CelebA workflow) ----------------------------

    def compute_attribute_delta(
        self,
        batches: Iterator[dict],
        num_batches: int | None = None,
        num_classes: int | None = None,
    ) -> np.ndarray:
        """Mean z_L over images with each attribute minus without it.

        `batches` yields {"image": uint8 (B,H,W,C), "attr": (B, A) in ±1} —
        or {"image", "label": (B,) int class ids} (image_folder class
        subdirectories), where each class is treated as a binary attribute
        (one-vs-rest delta; row i moves a latent toward class i).
        `num_classes` sizes the label one-hot (defaults to cfg.y_classes).
        Returns delta of shape (A, *z_shape).  (reference:
        upstream:network/inferer.py compute_attribute_delta)
        """
        k = num_classes or self.cfg.y_classes

        def as_attr(batch) -> np.ndarray:
            if "attr" in batch:
                return np.asarray(batch["attr"]) > 0  # (B, A)
            lab = np.asarray(batch["label"]).astype(np.int64)
            if lab.max() >= k:
                raise ValueError(
                    f"label {int(lab.max())} >= num_classes {k}; pass "
                    f"num_classes (CLI: --set glow.y_classes=N)"
                )
            return np.eye(k, dtype=bool)[lab]  # one-vs-rest

        sum_with = sum_without = None
        n_with = n_without = None
        seen = 0
        for batch in batches:
            if num_batches is not None and seen >= num_batches:
                break
            seen += 1
            z = np.asarray(self.encode(jnp.asarray(batch["image"])))
            attr = as_attr(batch)
            if sum_with is None:
                a = attr.shape[1]
                sum_with = np.zeros((a, *z.shape[1:]), np.float64)
                sum_without = np.zeros_like(sum_with)
                n_with = np.zeros((a,), np.int64)
                n_without = np.zeros((a,), np.int64)
            # (B, A) x (B, ...) -> (A, ...) sums via tensordot on batch axis.
            sum_with += np.tensordot(attr.astype(np.float64), z, axes=(0, 0))
            sum_without += np.tensordot((~attr).astype(np.float64), z, axes=(0, 0))
            n_with += attr.sum(0)
            n_without += (~attr).sum(0)
        mean_with = sum_with / np.maximum(1, n_with)[:, None, None, None]
        mean_without = sum_without / np.maximum(1, n_without)[:, None, None, None]
        return (mean_with - mean_without).astype(np.float32)

    @staticmethod
    def save_attribute_delta(path: str, delta: np.ndarray, names: list[str] | None = None):
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        np.savez(path, delta=delta, names=np.asarray(names or [], dtype=object))

    @staticmethod
    def load_attribute_delta(path: str) -> np.ndarray:
        return np.load(path, allow_pickle=True)["delta"]

    def apply_attribute_delta(self, z, delta: np.ndarray, attr_idx: int, strength: float):
        """z' = z + strength * delta[attr_idx] (reference semantics)."""
        return jnp.asarray(z) + strength * jnp.asarray(delta[attr_idx])

    def manipulate(self, images, delta, attr_idx: int, strength: float,
                   temperature: float = 0.0) -> np.ndarray:
        z = self.encode(images)
        z = self.apply_attribute_delta(z, delta, attr_idx, strength)
        return self.decode(z, temperature=temperature)

    # -- latent interpolation -------------------------------------------------

    def interpolate(self, img_a, img_b, steps: int = 8, temperature: float = 0.0) -> np.ndarray:
        """Linear interpolation in z_L between two images -> (steps, H, W, C)."""
        za = self.encode(jnp.asarray(img_a)[None])[0]
        zb = self.encode(jnp.asarray(img_b)[None])[0]
        ts = jnp.linspace(0.0, 1.0, steps)[:, None, None, None]
        zs = (1.0 - ts) * za[None] + ts * zb[None]
        return self.decode(zs, temperature=temperature)

    def interpolate_full(self, img_a, img_b, steps: int = 8) -> np.ndarray:
        """Interpolate in the FULL latent space (z_L plus every Split2d half):
        endpoints reproduce the inputs exactly (reconstruction round-trip),
        intermediate frames morph deterministically."""
        za, sa = self.encode_full(jnp.asarray(img_a)[None])
        zb, sb = self.encode_full(jnp.asarray(img_b)[None])
        ts = jnp.linspace(0.0, 1.0, steps)[:, None, None, None]

        def lerp(a, b):
            return (1.0 - ts) * a[0][None] + ts * b[0][None]

        return self.decode_full(lerp(za, zb), [lerp(a, b) for a, b in zip(sa, sb)])
