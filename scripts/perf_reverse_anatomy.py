#!/usr/bin/env python
"""Anatomy of the fused level-0 REVERSE (sampling) kernel: why is reverse
MFU ~0.741 vs forward ~0.756 when it does strictly LESS work (no logdet)?
Builds variant kernels at the flagship level-0 shape and times each
(two-N differencing), mirroring scripts/perf_kernel_anatomy.py.

Variants (C = correct math, A = attribution-only / numerically wrong):

  full        C  production reverse (ops/flowstep_pallas.py math)
  recip_exp   C  z2/s -> z2 * (1 + exp(-(raw+2))): 1/sigmoid(x) = 1+exp(-x),
                 replacing the VPU divide with one exp + mul
  split_mix   C  W^-1 mix as two K=c/2 dots on z1/z2 (drops the sublane
                 concatenate before the mix matmul)
  no_div      A  z2 * s - shift (drops the divide, keeps everything else)
  no_mix      A  skip the trailing W^-1 matmul + actnorm inverse
  matmul_only A  conv1/conv3 consume pre-staged scratch (pure MXU chain)

If a C-variant wins in situ it is a real production edit candidate — but
A/B the actual kernel edit on hardware before flipping anything (Mosaic's
scheduling is budget-cliffed; see docs/BENCHMARKING.md).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_reverse_anatomy.py
Env: KA_BATCH (128), KA_N1/KA_N2 (30/130)
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_glow_tpu.config import PRESETS
from pytorch_glow_tpu.models import glow, layers as L
from pytorch_glow_tpu.ops import flowstep_pallas as fsp

HIGHEST = jax.lax.Precision.HIGHEST
BATCH = int(os.environ.get("KA_BATCH", "128"))
N1 = int(os.environ.get("KA_N1", "30"))
N2 = int(os.environ.get("KA_N2", "130"))
HH = WW = 32
C = 12
HIDDEN = 512


def _make_variant(variant: str, tb, hh, ww, c, hidden):
    ch = c // 2
    cout = c
    n = tb * hh * ww

    def kernel(z_ref, wt_ref, anb_ref, anl_ref, w1_ref, a1b_ref, a1l_ref,
               w2_ref, a2b_ref, a2l_ref, w3_ref, b3_ref, l3_ref,
               zn_ref, ld_ref, p1, h1, h2):
        masks = fsp._border_masks(hh, ww, n)
        z = z_ref[:]
        z1, z2 = z[:ch, :], z[ch:, :]
        if variant == "matmul_only":
            # Pure MXU chain: conv1 consumes the (unstaged) patch scratch,
            # conv3's taps are summed without rolls/masks — same FLOPs, no
            # VPU work.  Numerically wrong; bound-attribution only.
            a = fsp._dot_bf16(w1_ref[:], p1[:])
            a = (a + a1b_ref[:, 0:1]) * jnp.exp(a1l_ref[:, 0:1])
            h1[:] = jnp.maximum(a, 0.0).astype(fsp.COUPLING_DTYPE)
            a = fsp._dot_bf16(w2_ref[:], h1[:])
            a = (a + a2b_ref[:, 0:1]) * jnp.exp(a2l_ref[:, 0:1])
            h2[:] = jnp.maximum(a, 0.0).astype(fsp.COUPLING_DTYPE)
            y = fsp._dot_bf16(w3_ref[:], h2[:])  # (9*cout, n)
            acc = jnp.zeros((cout, n), jnp.float32)
            for k in range(9):
                acc = acc + y[k * cout : (k + 1) * cout, :]
            h = (acc + b3_ref[:, 0:1]) * jnp.exp(l3_ref[:, 0:1] * 3.0)
        else:
            h = fsp._net_T(z1, w1_ref, a1b_ref, a1l_ref, w2_ref, a2b_ref,
                           a2l_ref, w3_ref, b3_ref, l3_ref, p1, h1, h2,
                           masks, hh, ww, ch, cout)
        shift, raw = h[:ch, :], h[ch:, :]
        if variant == "recip_exp":
            z2 = z2 * (1.0 + jnp.exp(-(raw + 2.0))) - shift
        elif variant == "no_div":
            z2 = z2 * jax.nn.sigmoid(raw + 2.0) - shift
        else:
            z2 = z2 / jax.nn.sigmoid(raw + 2.0) - shift
        if variant == "split_mix":
            zn = (
                jnp.dot(wt_ref[:, :ch], z1, preferred_element_type=jnp.float32,
                        precision=HIGHEST)
                + jnp.dot(wt_ref[:, ch:], z2, preferred_element_type=jnp.float32,
                          precision=HIGHEST)
            )
            zn = zn * jnp.exp(-anl_ref[:, 0:1]) - anb_ref[:, 0:1]
        elif variant == "no_mix":
            zn = jnp.concatenate([z1, z2], axis=0)
        else:
            zn = jnp.concatenate([z1, z2], axis=0)
            zn = jnp.dot(wt_ref[:], zn, preferred_element_type=jnp.float32,
                         precision=HIGHEST)
            zn = zn * jnp.exp(-anl_ref[:, 0:1]) - anb_ref[:, 0:1]
        zn_ref[:] = zn
        ld_ref[pl.ds(pl.program_id(0) * tb, tb), :] = jnp.zeros(
            (tb, 128), jnp.float32
        )

    return kernel


def run_variant(variant, b, weights):
    c, hh, ww, hidden = C, HH, WW, HIDDEN
    ch = c // 2
    tb = fsp._tile_batch(b, hh, ww, c, hidden)
    n = tb * hh * ww
    total = b * hh * ww
    kernel = _make_variant(variant, tb, hh, ww, c, hidden)
    rep = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    zspec = pl.BlockSpec((c, n), lambda i: (0, i), memory_space=pltpu.VMEM)

    def step(zt):
        return pl.pallas_call(
            kernel,
            grid=(b // tb,),
            in_specs=[zspec] + [rep(w.shape) for w in weights],
            out_specs=[
                zspec,
                pl.BlockSpec((b, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((c, total), jnp.float32),
                jax.ShapeDtypeStruct((b, 128), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((9 * ch, n), fsp.COUPLING_DTYPE),
                pltpu.VMEM((hidden, n), fsp.COUPLING_DTYPE),
                pltpu.VMEM((hidden, n), fsp.COUPLING_DTYPE),
            ],
            interpret=fsp._interpret(),
        )(zt, *weights)

    zt = jax.random.normal(jax.random.key(1), (c, total), jnp.float32)

    def body(zt, carry):
        zn, ld = step(zt + carry * 1e-20)
        return carry + (jnp.mean(zn) + jnp.mean(ld)) * 1e-6

    def loop_n(nn):
        @jax.jit
        def loop(zt):
            return jax.lax.fori_loop(0, nn, lambda i, cc: body(zt, cc),
                                     jnp.float32(0.0))

        loop(zt).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop(zt).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = loop_n(N1), loop_n(N2)
    return max(1e-9, (t2 - t1) / (N2 - N1)), tb


def main():
    cfg = PRESETS["celeba64"].glow
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    params = glow.init_glow(jax.random.key(0), cfg)
    sp = jax.tree.map(lambda a: a[0], params["levels"][0]["steps"])
    weights = [jnp.asarray(w) for w in fsp.pack_weights(sp, kind, True, True)]
    print(f"device: {jax.devices()[0].device_kind} level-0 REVERSE {HH}x{WW} "
          f"c={C} hidden={HIDDEN} b={BATCH} N={N1},{N2}", flush=True)
    ch = C // 2
    flops = 2 * BATCH * HH * WW * (HIDDEN * (9 * ch + HIDDEN + 9 * C) + C * C)
    bound = flops / 197e12
    base = None
    for variant in ("full", "recip_exp", "split_mix", "no_div", "no_mix",
                    "matmul_only"):
        t, tb = run_variant(variant, BATCH, weights)
        if base is None:
            base = t
        print(f"{variant:12s}: {t*1e6:7.1f} us  ({100*bound/t:5.1f}% MFU, "
              f"{100*(base-t)/base:+5.1f}% vs full, tile_b={tb})", flush=True)
    print(f"bf16 physics bound: {bound*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
