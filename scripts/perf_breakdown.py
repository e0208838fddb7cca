#!/usr/bin/env python
"""Within-process component timing on real TPU: where do the ms go?

Times each building block of the celeba64 flagship forward/sample step.
Methodology (tunnel-safe, hoist-safe):
* every body takes the loop carry INTO its data path (z + carry) so XLA
  cannot hoist it out of the fori_loop as loop-invariant;
* each measurement runs at two chained iteration counts N1 < N2 in one jit
  and reports (t2 - t1) / (N2 - N1), cancelling the per-dispatch tunnel
  latency (20-200 ms on this machine) exactly.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_breakdown.py
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp

from pytorch_glow_tpu.config import PRESETS
from pytorch_glow_tpu.models import glow, layers as L
from pytorch_glow_tpu.ops import invconv_xla as ic

BATCH = 128
N1, N2 = 20, 120


def timed(fn, *args, n1=None, n2=None):
    """Seconds per iteration via two-N differencing; fn(*args, carry)->scalar
    must consume the carry in its data path."""
    n1 = n1 if n1 is not None else N1
    n2 = n2 if n2 is not None else N2

    def loop_n(n):
        @jax.jit
        def loop(*a):
            return jax.lax.fori_loop(
                0, n, lambda i, c: fn(*a, c), jnp.float32(0.0)
            )

        loop(*args).block_until_ready()  # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop(*args).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = loop_n(n1), loop_n(n2)
    return max(1e-9, (t2 - t1) / (n2 - n1))


def main():
    cfg = PRESETS["celeba64"].glow
    print(f"device: {jax.devices()[0].device_kind}  batch={BATCH}  N={N1},{N2}")
    h, w, c = cfg.image_shape
    dtype = jnp.dtype(cfg.compute_dtype)

    params = glow.init_glow(jax.random.key(0), cfg)
    x_u8 = jax.random.randint(jax.random.key(1), (BATCH, h, w, c), 0, 256, jnp.uint8)
    x = glow.preprocess(x_u8, cfg)
    params = glow.ddi_init(params, x, cfg)

    # ---- full paths (carry-coupled through the input) ----
    def full_fwd(params, x, carry):
        out = glow.log_prob(params, x + carry * 1e-20, cfg)
        return carry + jnp.mean(out["nll"]) * 1e-6

    def full_sample(params, carry):
        imgs = glow.sample(
            params,
            jax.random.fold_in(jax.random.key(2), carry.astype(jnp.int32)),
            cfg, n=BATCH, temperature=0.7,
        )
        return carry + jnp.mean(imgs) * 1e-6

    def full_recon(params, x, carry):
        imgs = glow.reconstruct(params, x + carry * 1e-20, cfg)
        return carry + jnp.mean(imgs) * 1e-6

    t_fwd = timed(full_fwd, params, x, n1=3, n2=13)
    print(f"full forward:  {t_fwd*1e3:8.2f} ms  ({BATCH/t_fwd:8.0f} img/s)")
    t_smp = timed(full_sample, params, n1=3, n2=13)
    print(f"full sample:   {t_smp*1e3:8.2f} ms  ({BATCH/t_smp:8.0f} img/s)")
    t_rec = timed(full_recon, params, x, n1=3, n2=13)
    print(f"full recon:    {t_rec*1e3:8.2f} ms  ({BATCH/t_rec:8.0f} img/s)")

    # ---- per-level component costs ----
    shapes = cfg.latent_shapes()
    total = {"coupling": 0.0, "coup_rev": 0.0, "invconv": 0.0,
             "invconv_rev": 0.0, "actnorm": 0.0}
    for li, (lh, lw, lc) in enumerate(shapes):
        z = jax.random.normal(jax.random.key(li), (BATCH, lh, lw, lc), jnp.float32)
        sp = jax.tree.map(lambda a: a[0], params["levels"][li]["steps"])

        def coup(sp, z, carry):
            out, ld, _ = L.coupling_forward(
                sp["coupling"], z + carry * 1e-20, jnp.zeros((BATCH,)),
                cfg.flow_coupling, compute_dtype=dtype,
            )
            return carry + (jnp.mean(out) + jnp.mean(ld)) * 1e-6

        def coup_rev(sp, z, carry):
            out = L.coupling_reverse(
                sp["coupling"], z + carry * 1e-20, cfg.flow_coupling,
                compute_dtype=dtype,
            )
            return carry + jnp.mean(out) * 1e-6

        def inv(sp, z, carry):
            w_mat = ic.lu_assemble(sp["perm"]["lu"])
            y = ic.mix_channels(
                z + carry * 1e-20, w_mat, ic.PRECISIONS[cfg.invconv_precision]
            )
            return carry + jnp.mean(y) * 1e-6

        def inv_rev(sp, z, carry):
            w_inv = ic.lu_inverse(sp["perm"]["lu"])
            y = ic.mix_channels(
                z + carry * 1e-20, w_inv, ic.PRECISIONS[cfg.invconv_precision]
            )
            return carry + jnp.mean(y) * 1e-6

        def an(sp, z, carry):
            y, _, _ = L.actnorm_forward(sp["actnorm"], z + carry * 1e-20, None)
            return carry + jnp.mean(y) * 1e-6

        ts = {
            "coupling": timed(coup, sp, z),
            "coup_rev": timed(coup_rev, sp, z),
            "invconv": timed(inv, sp, z),
            "invconv_rev": timed(inv_rev, sp, z),
            "actnorm": timed(an, sp, z),
        }
        for k, v in ts.items():
            total[k] += v * cfg.K
        print(
            f"level {li} ({lh}x{lw}x{lc}): "
            + "  ".join(f"{k} {v*1e6:7.0f} us" for k, v in ts.items())
            + f"   (x K={cfg.K})"
        )

    print("\nK-weighted sums (ms): "
          + "  ".join(f"{k} {v*1e3:7.2f}" for k, v in total.items()))
    fwd_sum = total["coupling"] + total["invconv"] + total["actnorm"]
    rev_sum = total["coup_rev"] + total["invconv_rev"] + total["actnorm"]
    print(f"component sum: fwd {fwd_sum*1e3:7.1f} ms (full {t_fwd*1e3:.1f})   "
          f"rev {rev_sum*1e3:7.1f} ms (full sample {t_smp*1e3:.1f})")

    # ---- coupling-net internals at level 0 (the big one) ----
    lh, lw, lc = shapes[0]
    z1 = jax.random.normal(jax.random.key(9), (BATCH, lh, lw, lc // 2), jnp.float32)
    cp = jax.tree.map(lambda a: a[0], params["levels"][0]["steps"])["coupling"]

    def conv1(cp, z1, carry):
        y, _ = L.conv2d_forward(cp["conv1"], (z1 + carry * 1e-20).astype(dtype))
        return carry + jnp.mean(y.astype(jnp.float32)) * 1e-6

    def conv2(cp, hbuf, carry):
        y, _ = L.conv2d_forward(cp["conv2"], hbuf + (carry * 1e-20).astype(dtype))
        return carry + jnp.mean(y.astype(jnp.float32)) * 1e-6

    def conv3(cp, hbuf, carry):
        y = L.conv2d_zeros_forward(
            cp["conv3"], hbuf + (carry * 1e-20).astype(dtype), compute_dtype=dtype
        )
        return carry + jnp.mean(y) * 1e-6

    hbuf = jax.random.normal(
        jax.random.key(10), (BATCH, lh, lw, cfg.hidden_channels), dtype
    )
    print(f"\nlevel-0 coupling internals ({lh}x{lw}, w={cfg.hidden_channels}):")
    print(f"  conv1 3x3 {lc//2}->512:  {timed(conv1, cp, z1)*1e6:7.0f} us")
    print(f"  conv2 1x1 512->512: {timed(conv2, cp, hbuf)*1e6:7.0f} us")
    print(f"  conv3 3x3 512->{lc}:  {timed(conv3, cp, hbuf)*1e6:7.0f} us")


if __name__ == "__main__":
    main()
