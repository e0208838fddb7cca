#!/usr/bin/env python
"""Anatomy of the fused level-0 forward kernel: what do the non-matmul ops
cost?  Builds VARIANT kernels at the flagship level-0 shape (32x32, c=12,
hidden=512) that drop specific work — border masks, conv taps (rolls), the
logdet fold — and times each (two-N differencing).  The variants are
numerically WRONG; they exist only to attribute the MFU gap:

  full          : the production kernel (ops/flowstep_pallas.py math)
  no_masks      : conv taps unmasked (drops 18 (1,n)-broadcast multiplies)
  no_rolls      : taps read z1 directly (drops 18 lane-rolls + masks)
  matmul_only   : conv1/conv3 consume pre-staged scratch (pure MXU chain)
  no_logdet     : affine shift/scale but no log_sigmoid fold / sel matmul

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_kernel_anatomy.py
Env: KA_BATCH (128), KA_N1/KA_N2 (30/130)
"""

from __future__ import annotations

import functools
import os
import time

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pytorch_glow_tpu.models import glow, layers as L
from pytorch_glow_tpu.config import PRESETS
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
    bf = fsp.COUPLING_DTYPE

    def kernel(z_ref, wt_ref, anb_ref, anl_ref, w1_ref, a1b_ref, a1l_ref,
               w2_ref, a2b_ref, a2l_ref, w3_ref, b3_ref, l3_ref,
               zn_ref, ld_ref, p1, h1, h2):
        masks = fsp._border_masks(hh, ww, n)
        z = z_ref[:]
        z = (z + anb_ref[:, 0:1]) * jnp.exp(anl_ref[:, 0:1])
        z = jnp.dot(wt_ref[:], z, preferred_element_type=jnp.float32,
                    precision=HIGHEST)
        z1, z2 = z[:ch, :], z[ch:, :]
        if variant != "matmul_only":
            for k, (dy, dx) in enumerate(fsp.OFFSETS):
                off = (dy - 1) * ww + (dx - 1)
                if variant == "no_rolls":
                    tap = z1
                else:
                    tap = fsp._roll_lanes(z1, -off)
                if variant in ("no_masks", "no_rolls"):
                    p1[k * ch : (k + 1) * ch, :] = tap.astype(bf)
                else:
                    p1[k * ch : (k + 1) * ch, :] = (tap * masks[k]).astype(bf)
        a = fsp._dot_bf16(w1_ref[:], p1[:])
        a = (a + a1b_ref[:, 0:1]) * jnp.exp(a1l_ref[:, 0:1])
        h1[:] = jnp.maximum(a, 0.0).astype(bf)
        a = fsp._dot_bf16(w2_ref[:], h1[:])
        a = (a + a2b_ref[:, 0:1]) * jnp.exp(a2l_ref[:, 0:1])
        h2[:] = jnp.maximum(a, 0.0).astype(bf)
        y = fsp._dot_bf16(w3_ref[:], h2[:])  # (9*cout, n) packed
        acc = jnp.zeros((cout, n), jnp.float32)
        for k, (dy, dx) in enumerate(fsp.OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            yk = y[k * cout : (k + 1) * cout, :]
            if variant == "matmul_only":
                acc = acc + yk
            elif variant == "no_rolls":
                acc = acc + yk * masks[k]
            elif variant == "no_masks":
                acc = acc + fsp._roll_lanes(yk, -off)
            else:
                acc = acc + fsp._roll_lanes(yk, -off) * masks[k]
        out = (acc + b3_ref[:, 0:1]) * jnp.exp(l3_ref[:, 0:1] * 3.0)
        shift, raw = out[:ch, :], out[ch:, :]
        s = jax.nn.sigmoid(raw + 2.0)
        z2 = (z2 + shift) * s
        zn_ref[:] = jnp.concatenate([z1, z2], axis=0)
        if variant == "no_logdet":
            ld_ref[pl.ds(pl.program_id(0) * tb, tb), :] = jnp.zeros(
                (tb, 128), jnp.float32
            )
        else:
            colsum = jnp.sum(jax.nn.log_sigmoid(raw + 2.0), axis=0, keepdims=True)
            img = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1) // (hh * ww)
            sel = (
                img == jax.lax.broadcasted_iota(jnp.int32, (tb, n), 0)
            ).astype(jnp.float32)
            ld = jax.lax.dot_general(
                sel, colsum, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            ld_ref[pl.ds(pl.program_id(0) * tb, tb), :] = jnp.broadcast_to(
                ld, (tb, 128)
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
    weights = [jnp.asarray(w) for w in fsp.pack_weights(sp, kind, True, False)]
    print(f"device: {jax.devices()[0].device_kind} level-0 {HH}x{WW} c={C} "
          f"hidden={HIDDEN} b={BATCH} N={N1},{N2}", flush=True)
    ch = C // 2
    flops = 2 * BATCH * HH * WW * (HIDDEN * (9 * ch + HIDDEN + 9 * C) + C * C)
    bound = flops / 197e12
    base = None
    for variant in ("full", "no_logdet", "no_masks", "no_rolls", "matmul_only"):
        t, tb = run_variant(variant, BATCH, weights)
        if base is None:
            base = t
        print(f"{variant:12s}: {t*1e6:7.1f} us  ({100*bound/t:5.1f}% MFU, "
              f"{100*(base-t)/base:+5.1f}% vs full, tile_b={tb})", flush=True)
    print(f"bf16 physics bound: {bound*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
