#!/usr/bin/env python
"""Per-level timing of the FUSED flow-step kernels on real TPU.

For each level of a preset: time one fused forward step and one fused
reverse step (transposed layout, carry-coupled, two-N differencing — the
scripts/perf_breakdown.py methodology), plus the analytic bf16 physics
bound for that level, so the remaining MFU gap is attributable per level.

Usage:
  PYTHONPATH=/root/repo:/root/.axon_site python scripts/perf_fused_levels.py
Env: PF_PRESET (celeba64), PF_BATCH (128), PF_N1/PF_N2 (20/120)
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp

from pytorch_glow_tpu.config import PRESETS
from pytorch_glow_tpu.models import glow, layers as L
from pytorch_glow_tpu.models.glow import _fused_step_forward, _fused_step_reverse
from pytorch_glow_tpu.ops import flowstep_pallas as fsp

PEAK_BF16 = 197e12  # v5e


def timed(fn, *args, n1: int, n2: int):
    def loop_n(n):
        @jax.jit
        def loop(*a):
            return jax.lax.fori_loop(0, n, lambda i, c: fn(*a, c), jnp.float32(0.0))

        loop(*args).block_until_ready()
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            loop(*args).block_until_ready()
            best = min(best, time.perf_counter() - t0)
        return best

    t1, t2 = loop_n(n1), loop_n(n2)
    return max(1e-9, (t2 - t1) / (n2 - n1))


def main():
    preset = os.environ.get("PF_PRESET", "celeba64")
    batch = int(os.environ.get("PF_BATCH", "128"))
    n1 = int(os.environ.get("PF_N1", "20"))
    n2 = int(os.environ.get("PF_N2", "120"))
    cfg = PRESETS[preset].glow
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    mode = cfg.flow_coupling
    hidden = cfg.hidden_channels
    print(f"device: {jax.devices()[0].device_kind}  preset={preset} "
          f"b={batch} N={n1},{n2}")

    params = glow.init_glow(jax.random.key(0), cfg)
    tot_f = tot_r = tot_bound = 0.0
    for li, (lh, lw, lc) in enumerate(cfg.latent_shapes()):
        sp = jax.tree.map(lambda a: a[0], params["levels"][li]["steps"])
        z = jax.random.normal(jax.random.key(li), (batch, lh, lw, lc), jnp.float32)
        zt = fsp.to_t(z)

        def fwd(sp, zt, carry):
            zn, ld = _fused_step_forward(
                sp, zt + carry * 1e-20, kind, mode, (lh, lw), batch
            )
            return carry + (jnp.mean(zn) + jnp.mean(ld)) * 1e-6

        def rev(sp, zt, carry):
            zn = _fused_step_reverse(
                sp, zt + carry * 1e-20, kind, mode, (lh, lw), batch
            )
            return carry + jnp.mean(zn) * 1e-6

        t_f = timed(fwd, sp, zt, n1=n1, n2=n2)
        t_r = timed(rev, sp, zt, n1=n1, n2=n2)
        ch = lc // 2
        cout = lc if mode == "affine" else ch
        flops = 2 * batch * lh * lw * (
            hidden * (9 * ch + hidden + 9 * cout) + lc * lc
        )
        bound = flops / PEAK_BF16
        halo = lh * lw > fsp._max_cols(lc, hidden, mode == "affine")
        tot_f += t_f * cfg.K
        tot_r += t_r * cfg.K
        tot_bound += bound * cfg.K
        print(f"level {li} ({lh}x{lw}x{lc}{' halo' if halo else ''}): "
              f"fwd {t_f*1e6:7.0f} us ({100*bound/t_f:5.1f}% MFU)  "
              f"rev {t_r*1e6:7.0f} us ({100*bound/t_r:5.1f}% MFU)  "
              f"bound {bound*1e6:6.0f} us  (x K={cfg.K})")

    print(f"\nK-weighted: fwd {tot_f*1e3:7.2f} ms ({100*tot_bound/tot_f:5.1f}% MFU)  "
          f"rev {tot_r*1e3:7.2f} ms ({100*tot_bound/tot_r:5.1f}% MFU)  "
          f"bound {tot_bound*1e3:6.2f} ms")
    print(f"implied fwd img/s {batch/(tot_f):0.0f}  rev {batch/(tot_r):0.0f}")


if __name__ == "__main__":
    main()
