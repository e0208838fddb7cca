#!/usr/bin/env python
"""Anatomy of the fused level-0 BACKWARD (training) kernel — the one
direction never variant-ablated (round-4 verdict Next #2): the production
training path runs ~66% PHYSICAL MFU (recompute + dgrad + wgrad FLOPs)
while the forward/reverse kernels reach ~77% of theirs.  Builds variant
backward kernels at the flagship level-0 shape (32x32, c=12, hidden=512)
and times each (two-N differencing), mirroring perf_kernel_anatomy.py.

Variants (C = correct math, A = attribution-only / numerically wrong):

  full         C  production backward (ops/flowstep_pallas.py
                  _make_bwd_kernel math, verbatim copy)
  no_accum     A  wgrad tiles overwrite instead of accumulate over the
                  grid (attributes the += VMEM read-modify-write)
  no_rowsum    A  drop the 8 bias/logs lane reductions (VPU rowsums)
  no_wgrad     A  skip all weight-grad matmuls + accumulation (leaves
                  recompute + dgrad: the flash-style dz-only cost)
  no_masks     A  drop border-mask multiplies (recompute taps, gy, g_v1)
  no_rolls     A  drop lane rolls everywhere (taps/cotangents unaligned)
  matmul_only  A  the same dependent-matmul chain consuming pre-staged
                  scratch: recompute (mix+conv1+conv2+9xconv3), dgrad
                  (g_h2 packed, g_h1, g_p1, mix), wgrad (4 dots) — the
                  kernel's pure-MXU upper bound

MFU is against the kernel's PHYSICAL matmul FLOPs (recompute+dgrad+wgrad,
3x the forward's net) at the bf16 peak.  If `full` is close to
`matmul_only`, the ceiling is structural (conv-shaped pipeline), like the
forward/reverse; a large gap names the work to chase.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_bwd_anatomy.py
Env: KA_BATCH (128), KA_N1/KA_N2 (20/70)
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
N1 = int(os.environ.get("KA_N1", "20"))
N2 = int(os.environ.get("KA_N2", "70"))
HH = WW = 32
C = 12
HIDDEN = 512
AFFINE = True


def _make_variant(variant: str, tb, hh, ww, c, hidden):
    ch = c // 2
    cout = c  # affine
    n = tb * hh * ww
    bf = fsp.COUPLING_DTYPE
    OFFSETS = fsp.OFFSETS
    _roll = fsp._roll_lanes
    _rowsum = fsp._rowsum
    rolls = variant != "no_rolls"
    masked = variant not in ("no_masks", "no_rolls", "matmul_only")
    pure = variant == "matmul_only"

    def kernel(z_ref, wt_ref, anb_ref, anl_ref, w1_ref, a1b_ref, a1l_ref,
               w2_ref, a2b_ref, a2l_ref, w3_ref, b3_ref, l3_ref,
               gzn_ref, gld_ref,
               gz_ref, gwt_ref, ganb_ref, ganl_ref, gw1_ref, ga1b_ref,
               ga1l_ref, gw2_ref, ga2b_ref, ga2l_ref, gw3_ref, gb3_ref,
               gl3_ref,
               p1, h1, h2, gh_a, gh_b, gy):
        masks = fsp._border_masks(hh, ww, n)

        # ---- recompute forward ----
        z = z_ref[:]
        u = (z + anb_ref[:, 0:1]) * jnp.exp(anl_ref[:, 0:1])
        v = jnp.dot(wt_ref[:], u, preferred_element_type=jnp.float32,
                    precision=HIGHEST)
        v1, v2 = v[:ch, :], v[ch:, :]
        if not pure:
            for k, (dy, dx) in enumerate(OFFSETS):
                off = (dy - 1) * ww + (dx - 1)
                tap = _roll(v1, -off) if rolls else v1
                p1[k * ch : (k + 1) * ch, :] = (
                    (tap * masks[k]) if masked else tap
                ).astype(bf)
        a = fsp._dot_bf16(w1_ref[:], p1[:])
        a = (a + a1b_ref[:, 0:1]) * jnp.exp(a1l_ref[:, 0:1])
        h1[:] = jnp.maximum(a, 0.0).astype(bf)
        a = fsp._dot_bf16(w2_ref[:], h1[:])
        a = (a + a2b_ref[:, 0:1]) * jnp.exp(a2l_ref[:, 0:1])
        h2[:] = jnp.maximum(a, 0.0).astype(bf)
        acc = jnp.zeros((cout, n), jnp.float32)
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            yk = fsp._dot_bf16(w3_ref[k * cout : (k + 1) * cout, :], h2[:])
            if pure:
                acc = acc + yk
            else:
                tap = _roll(yk, -off) if rolls else yk
                acc = acc + (tap * masks[k] if masked else tap)
        e3l3 = jnp.exp(l3_ref[:, 0:1] * 3.0)
        out = (acc + b3_ref[:, 0:1]) * e3l3

        # ---- backward through shift/scale (affine) ----
        gzn = gzn_ref[:]
        go1, go2 = gzn[:ch, :], gzn[ch:, :]
        shift, raw = out[:ch, :], out[ch:, :]
        s = jax.nn.sigmoid(raw + 2.0)
        g_raw = (
            go2 * (v2 + shift) * (s * (1.0 - s))
            + gld_ref[0:1, :] * (1.0 - s)
        )
        g_v2 = go2 * s
        g_out = jnp.concatenate([g_v2, g_raw], axis=0)

        # ---- conv3 backward ----
        g_acc = g_out * e3l3
        if variant == "no_rowsum":
            gb3 = jnp.zeros((cout, 1), jnp.float32)
            gl3 = gb3
        else:
            gb3 = _rowsum(g_acc)
            gl3 = 3.0 * _rowsum(g_out * out)
        if pure:
            gy[:] = jnp.broadcast_to(
                g_acc[0:1, :], (9 * cout, n)
            ).astype(bf)
        else:
            for k, (dy, dx) in enumerate(OFFSETS):
                off = (dy - 1) * ww + (dx - 1)
                t = g_acc * masks[k] if masked else g_acc
                gy[k * cout : (k + 1) * cout, :] = (
                    _roll(t, off) if rolls else t
                ).astype(bf)
        gh_a[:] = jax.lax.dot_general(
            w3_ref[:], gy[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # ---- conv2 backward ----
        h2f = h2[:].astype(jnp.float32)
        g_a2n = gh_a[:] * (h2f > 0.0)
        g_a2 = g_a2n * jnp.exp(a2l_ref[:, 0:1])
        if variant == "no_rowsum":
            ga2b = jnp.zeros((hidden, 1), jnp.float32)
            ga2l = ga2b
        else:
            ga2b = _rowsum(g_a2)
            ga2l = _rowsum(g_a2n * h2f)
        gh_b[:] = jax.lax.dot_general(
            w2_ref[:], g_a2.astype(bf),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # ---- conv1 backward ----
        h1f = h1[:].astype(jnp.float32)
        g_a1n = gh_b[:] * (h1f > 0.0)
        g_a1 = g_a1n * jnp.exp(a1l_ref[:, 0:1])
        if variant == "no_rowsum":
            ga1b = jnp.zeros((hidden, 1), jnp.float32)
            ga1l = ga1b
        else:
            ga1b = _rowsum(g_a1)
            ga1l = _rowsum(g_a1n * h1f)
        g_a1_bf = g_a1.astype(bf)
        g_p1 = jax.lax.dot_general(
            w1_ref[:], g_a1_bf,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_v1 = go1
        if pure:
            g_v1 = g_v1 + g_p1[:ch, :]
        else:
            for k, (dy, dx) in enumerate(OFFSETS):
                off = (dy - 1) * ww + (dx - 1)
                t = g_p1[k * ch : (k + 1) * ch, :]
                t = t * masks[k] if masked else t
                g_v1 = g_v1 + (_roll(t, off) if rolls else t)

        # ---- mix + actnorm backward ----
        g_v = jnp.concatenate([g_v1, g_v2], axis=0)
        g_u = jax.lax.dot_general(
            wt_ref[:], g_v,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGHEST,
        )
        gz_ref[:] = g_u * jnp.exp(anl_ref[:, 0:1])
        if variant == "no_rowsum":
            ganb = jnp.zeros((c, 1), jnp.float32)
            ganl = ganb
        else:
            ganb = _rowsum(gz_ref[:])
            ganl = _rowsum(g_u * u)

        # ---- weight grads ----
        first = pl.program_id(0) == 0
        if variant == "no_wgrad":
            zero = [
                (gwt_ref,), (ganb_ref,), (ganl_ref,), (gw1_ref,),
                (ga1b_ref,), (ga1l_ref,), (gw2_ref,), (ga2b_ref,),
                (ga2l_ref,), (gw3_ref,), (gb3_ref,), (gl3_ref,),
            ]

            @pl.when(first)
            def _():
                for (ref,) in zero:
                    ref[:] = jnp.zeros(ref.shape, jnp.float32)

            return

        contribs = [
            (gwt_ref, jax.lax.dot_general(
                g_v, u, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HIGHEST)),
            (ganb_ref, ganb),
            (ganl_ref, ganl),
            (gw1_ref, jax.lax.dot_general(
                g_a1_bf, p1[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)),
            (ga1b_ref, ga1b),
            (ga1l_ref, ga1l),
            (gw2_ref, jax.lax.dot_general(
                g_a2.astype(bf), h1[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)),
            (ga2b_ref, ga2b),
            (ga2l_ref, ga2l),
            (gb3_ref, gb3),
            (gl3_ref, gl3),
            (gw3_ref, jax.lax.dot_general(
                gy[:], h2[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)),
        ]
        if variant == "no_accum":
            for ref, val in contribs:
                ref[:] = val
            return

        @pl.when(first)
        def _():
            for ref, val in contribs:
                ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            for ref, val in contribs:
                ref[:] = ref[:] + val

    return kernel


def run_variant(variant, b, weights):
    c, hh, ww, hidden = C, HH, WW, HIDDEN
    ch = c // 2
    cout = c
    tb = fsp._bwd_tile_batch(b, hh, ww, c, hidden, AFFINE)
    n = tb * hh * ww
    total = b * hh * ww
    if variant == "full":
        kernel = fsp._make_bwd_kernel(tb, hh, ww, c, hidden, AFFINE)
    else:
        kernel = _make_variant(variant, tb, hh, ww, c, hidden)
    rep = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    zspec = pl.BlockSpec((c, n), lambda i: (0, i), memory_space=pltpu.VMEM)
    gldspec = pl.BlockSpec((1, n), lambda i: (0, i), memory_space=pltpu.VMEM)
    grad_shapes = [
        (c, c), (c, 1), (c, 1), (hidden, 9 * ch), (hidden, 1), (hidden, 1),
        (hidden, hidden), (hidden, 1), (hidden, 1), (9 * cout, hidden),
        (cout, 1), (cout, 1),
    ]

    def step(zt, gzn, gld):
        return pl.pallas_call(
            kernel,
            grid=(b // tb,),
            in_specs=[zspec] + [rep(w.shape) for w in weights]
            + [zspec, gldspec],
            out_specs=[zspec] + [rep(s) for s in grad_shapes],
            out_shape=[jax.ShapeDtypeStruct((c, total), jnp.float32)]
            + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
            scratch_shapes=[
                pltpu.VMEM((9 * ch, n), fsp.COUPLING_DTYPE),
                pltpu.VMEM((hidden, n), fsp.COUPLING_DTYPE),
                pltpu.VMEM((hidden, n), fsp.COUPLING_DTYPE),
                pltpu.VMEM((hidden, n), jnp.float32),
                pltpu.VMEM((hidden, n), jnp.float32),
                pltpu.VMEM((9 * cout, n), fsp.COUPLING_DTYPE),
            ],
            interpret=fsp._interpret(),
        )(zt, *weights, gzn, gld)

    zt = jax.random.normal(jax.random.key(1), (c, total), jnp.float32)
    gzn = jax.random.normal(jax.random.key(2), (c, total), jnp.float32)
    gld = jnp.ones((1, total), jnp.float32)

    def body(carry):
        outs = step(zt + carry * 1e-20, gzn, gld)
        return carry + (jnp.mean(outs[0]) + jnp.mean(outs[1])) * 1e-6

    def loop_n(nn):
        @jax.jit
        def loop(z0):
            return jax.lax.fori_loop(
                0, nn, lambda i, cc: body(cc), jnp.float32(0.0)
            )

        jax.device_get(loop(zt))  # compile + run (tunnel-safe sync)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            jax.device_get(loop(zt))
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = loop_n(N1), loop_n(N2)
    return max(1e-9, (t2 - t1) / (N2 - N1)), tb


def main():
    cfg = PRESETS["celeba64"].glow
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    params = glow.init_glow(jax.random.key(0), cfg)
    sp = jax.tree.map(lambda a: a[0], params["levels"][0]["steps"])
    weights = [jnp.asarray(w) for w in fsp.pack_weights(sp, kind, AFFINE, False)]
    ch = C // 2
    # Physical matmul FLOPs: recompute + dgrad + wgrad of the coupling net
    # (3x the forward net) + 3 mix-matmul chains + 2 wgrad outer products.
    net = 2 * BATCH * HH * WW * HIDDEN * (9 * ch + HIDDEN + 9 * C)
    mix = 2 * BATCH * HH * WW * C * C
    flops = 3 * net + 3 * mix
    bound = flops / 197e12
    print(f"device: {jax.devices()[0].device_kind} level-0 BACKWARD "
          f"{HH}x{WW} c={C} hidden={HIDDEN} b={BATCH} N={N1},{N2} "
          f"physical={flops/1e9:.1f} GFLOP/step", flush=True)
    base = None
    for variant in ("full", "no_accum", "no_rowsum", "no_wgrad",
                    "no_masks", "no_rolls", "matmul_only"):
        t, tb = run_variant(variant, BATCH, weights)
        if base is None:
            base = t
        print(f"{variant:12s}: {t*1e6:7.1f} us  ({100*bound/t:5.1f}% MFU, "
              f"{100*(base-t)/base:+5.1f}% vs full, tile_b={tb})", flush=True)
    print(f"bf16 physics bound: {bound*1e6:7.1f} us", flush=True)


if __name__ == "__main__":
    main()
