"""Pallas TPU kernel: ONE fused flow step (actnorm + 1x1 conv + coupling).

Why (measured on v5e, scripts/perf_breakdown.py): the coupling net is ~96%
of Glow's step time and is HBM-bound — XLA materializes both 512-wide
hidden activations (~134 MB per level-0 step at batch 128) in HBM between
convs, because XLA never fuses across matmuls/convs.  This kernel runs the
ENTIRE step per tile with every intermediate resident in VMEM:

    forward:  z' = (z + b) * e^l            (actnorm)
              z' = W @ z'                   (1x1 channel mix, f32 HIGHEST)
              h  = f(z1')                   (conv3x3 -> conv1x1 -> conv3x3,
                                             bf16 MXU, f32 accumulation)
              z2'' = (z2' + shift) * sigmoid(raw + 2)    [affine]
              out = cat(z1', z2''), ld = sum log sigmoid(raw + 2)

    reverse:  the exact inverse chain with W^{-1} (solved outside, once).

Layout: everything runs TRANSPOSED — channels on sublanes, pixels on lanes,
z_T (C, B*H*W) image-major.  Glow's channel counts are tiny (6..96), so the
natural (pixels, C) layout would pad every lane vector C -> 128 and waste
>10x VMEM bandwidth on each of the 9 conv-tap moves; with pixels on lanes
every buffer is fully packed and a conv tap is one hardware lane-roll
(`pltpu.roll`) plus an iota border mask.  The K-step scan carries z_T so
the NHWC<->transposed conversion happens once per level, not per step.

3x3 convs as matmuls (see /opt/skills/guides/pallas_guide.md):
* conv1: 9 rolled+masked views of z1 stack into a (9*Cin, N) patch matrix
  -> one (hidden, 9*Cin) @ (9*Cin, N) matmul.
* conv3 (512 -> tiny Cout) is "tap-packed": one (9*Cout, 512) @ (512, N)
  matmul, then the 9 taps are rolled back and summed — sublane padding
  <=1.2x instead of the >10x a (512 -> Cout) matmul would waste.
* Grid tiles the pixel axis at image boundaries (TB images per step), so
  rolls never need cross-tile halos — the border masks already zero them.

Coupling compute is bf16 (identical to the XLA path's compute_dtype);
actnorm / channel-mix / shift-scale / logdet run f32 (HIGHEST for the mix —
the logdet and exact round-trip depend on it).  Forward and reverse share
the f() net code, so decode(encode(x)) stays exact under the kernel.

Training runs fused in BOTH directions: a hand-derived backward kernel
(`_make_bwd_kernel`) recomputes the forward in VMEM and emits cotangents
for (z, all weights) in one pass — weight grads accumulate across grid
steps in constant-index output blocks and map back to the param pytree via
jax.vjp of `pack_weights` (models/glow.py custom_vjp).  Proven exact
against f32 autodiff (tests/test_flowstep_pallas.py
`test_fused_backward_kernel_exact_at_f32`); shapes the backward's VMEM
budget can't tile fall back to jax.custom_vjp over the XLA layer math.

On non-TPU backends the kernels run in interpret mode (tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

HIGHEST = jax.lax.Precision.HIGHEST
# Coupling-net compute dtype inside the kernels (bf16 on the MXU).
# Tests monkeypatch this to float32 to prove the hand-derived backward
# against exact-precision autodiff (clear the _partitioned caches first).
COUPLING_DTYPE = jnp.bfloat16
# Tap order k = 3*dy + dx, dy/dx in {0,1,2} around the centre pixel.
OFFSETS = [(dy, dx) for dy in range(3) for dx in range(3)]


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


MAX_TILE_COLS = 4096
# Mosaic's scoped-VMEM limit is the physical ~16 MB; the byte/column model
# below undercounts transients (rolls, masked products, concats), so budget
# conservatively — a 4096-column level-0 tile measured only ~4% faster than
# 2048 and overflowed VMEM inside the full chained loop.
VMEM_BUDGET = 8 * 2**20 + 2**19


def _bytes_per_col(c: int, hidden: int, affine: bool = True) -> int:
    """Approximate VMEM bytes per pixel column: h1+h2 (bf16) + p1 patches
    (bf16) + double-buffered f32 in/out blocks + acc/y_k f32 values +
    the tap-packed conv3 intermediate on narrow levels.  The packed-conv3
    predicate matches _net_T's exactly (9*cout, with cout depending on the
    coupling mode) so the budget covers the (9*cout, n) f32 intermediate
    whenever the kernel actually allocates it."""
    ch = c // 2
    cout = c if affine else ch
    packed_y = 9 * cout * 4 if 9 * cout <= 256 else 0
    return 2 * hidden * 2 + 9 * ch * 2 + 4 * c * 4 + 2 * c * 4 + packed_y


def _max_cols(c: int, hidden: int, affine: bool = True) -> int:
    return min(MAX_TILE_COLS, VMEM_BUDGET // _bytes_per_col(c, hidden, affine))


def _halo_rows(hh: int, ww: int, c: int, hidden: int,
               affine: bool = True) -> int | None:
    """Rows-per-tile R for the halo-tiled variant (tiles subdivide ONE
    image into hh/R row bands; the kernel recomputes a 2-row halo on each
    side — the coupling net's receptive field — so rolls stay tile-local).
    Returns the largest R with: R divides hh, R >= 4, R*ww lane-aligned,
    and the (R+4)-row extended compute region within the VMEM budget.

    The halo pallas_call additionally keeps three z input blocks
    (prev/cur/next, double-buffered) and a (c, n_ext) f32 ext scratch the
    whole-image byte model does not know about — ~5*c*4 extra bytes per
    extended column — so the halo path budgets them explicitly."""
    halo_bytes = _bytes_per_col(c, hidden, affine) + 5 * c * 4
    cap = min(MAX_TILE_COLS, VMEM_BUDGET // halo_bytes)
    best = None
    for r in range(4, hh):
        if hh % r or (r * ww) % 128:
            continue
        if (r + 4) * ww <= cap:
            best = r
    return best


def _whole_image_ok(h: int, w: int, c: int, hidden: int,
                    b: int | None = None, affine: bool = True) -> bool:
    """Whole-image forward tiling feasible?  With `b` given, also verifies a
    feasible tile exists: a divisor of b whose tile is lane-aligned (128
    columns) and under the cap, or a single full tile that itself fits —
    `_tile_batch` falls back to tb=b when no aligned divisor fits, and that
    full tile is only legal when it actually fits VMEM (same contract as
    `_bwd_whole_image_ok` on the backward side)."""
    cap = _max_cols(c, hidden, affine)
    hw = h * w
    if hw > cap:
        return False
    if b is None or b * hw <= cap:
        return True
    return any(
        b % d == 0 and (d * hw) % 128 == 0 and d * hw <= cap
        for d in range(1, b + 1)
    )


def supported(h: int, w: int, c: int, hidden: int, affine: bool = True,
              b: int | None = None) -> bool:
    """Whole images per tile when one image's pixels fit the VMEM budget;
    otherwise halo row-band tiles (e.g. the 128x128 levels of 256x256
    configs).  False only when even a 4-row band cannot fit."""
    if _whole_image_ok(h, w, c, hidden, b, affine):
        return True
    return _halo_rows(h, w, c, hidden, affine) is not None


def _tile_batch(b: int, h: int, w: int, c: int, hidden: int,
                affine: bool = True) -> int:
    """Images per grid step: pixel tiles must be lane-aligned (multiple of
    128 columns) unless a single tile covers the whole array; as many
    columns as the VMEM budget allows (bigger tiles amortize grid overhead;
    measured best on v5e)."""
    hw = h * w
    cap = _max_cols(c, hidden, affine)
    best = None
    for d in range(1, b + 1):
        if b % d:
            continue
        if (d * hw) % 128 == 0 and d * hw <= cap:
            if best is None or abs(d * hw - cap) < abs(best * hw - cap):
                best = d
    return best if best is not None else b  # single full tile (tests)


# ---------------------------------------------------------------------------
# Kernel bodies (statics closed over via factory)
# ---------------------------------------------------------------------------


def _border_masks(hh: int, ww: int, n: int):
    """mask[k] (1, n) f32: 1 where pixel p's k-th tap lands inside the
    image (image-major pixel order; taps never cross image boundaries)."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    x = idx % ww
    y = (idx // ww) % hh
    masks = []
    for dy, dx in OFFSETS:
        ok_y = jnp.logical_and(y + dy - 1 >= 0, y + dy - 1 < hh)
        ok_x = jnp.logical_and(x + dx - 1 >= 0, x + dx - 1 < ww)
        masks.append(jnp.logical_and(ok_y, ok_x).astype(jnp.float32))
    return masks


def _dot_bf16(a, b):
    """bf16 x bf16 -> f32 matmul; on CPU interpret mode the operands are
    upcast (bf16 products are exact in f32, so semantics match the MXU)."""
    if _interpret():
        a, b = a.astype(jnp.float32), b.astype(jnp.float32)
    return jnp.dot(a, b, preferred_element_type=jnp.float32)


def _roll_lanes(x, shift: int):
    """Circular lane roll; pltpu.roll only takes non-negative shifts."""
    n = x.shape[1]
    shift %= n
    return pltpu.roll(x, shift, 1) if shift else x


def _net_T(z1, w1_ref, a1b_ref, a1l_ref, w2_ref, a2b_ref, a2l_ref,
           w3_ref, b3_ref, l3_ref, p1, h1, h2, masks,
           hh, ww, cin, cout):
    """The coupling net f() transposed: z1 (cin, n) f32 -> (cout, n) f32.
    Shared verbatim by forward and reverse (exact round-trip)."""
    n = z1.shape[1]
    # conv1 patches: tap k = lane-roll by -offset, border-masked.  Rolls
    # run in f32 (Mosaic's lane rotate is 32-bit only); cast per tap.
    for k, (dy, dx) in enumerate(OFFSETS):
        off = (dy - 1) * ww + (dx - 1)
        tap = _roll_lanes(z1, -off)
        p1[k * cin : (k + 1) * cin, :] = (tap * masks[k]).astype(COUPLING_DTYPE)
    a = _dot_bf16(w1_ref[:], p1[:])
    a = (a + a1b_ref[:, 0:1]) * jnp.exp(a1l_ref[:, 0:1])
    h1[:] = jnp.maximum(a, 0.0).astype(COUPLING_DTYPE)
    a = _dot_bf16(w2_ref[:], h1[:])
    a = (a + a2b_ref[:, 0:1]) * jnp.exp(a2l_ref[:, 0:1])
    h2[:] = jnp.maximum(a, 0.0).astype(COUPLING_DTYPE)
    # conv3.  Narrow levels (9*cout <= 256): ONE tap-packed
    # (9*cout, hidden) @ (hidden, n) matmul — M=9*cout fills the MXU's row
    # dimension where nine separate M=cout matmuls leave it ~90% idle
    # (level 0 of the 64x64 configs is 76% of step time; measured win).
    # Wide levels keep tap-separate matmuls: the packed (9*cout, n) f32
    # intermediate would blow VMEM there, and they are a tiny time share.
    if 9 * cout <= 256:
        y = _dot_bf16(w3_ref[:], h2[:])  # (9*cout, n) f32
        acc = jnp.zeros((cout, n), jnp.float32)
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            # out[p] += Y[p + off, tap k] — same gather direction as conv1's
            # taps; the mask (a function of the OUTPUT pixel) zeroes taps
            # that would cross an image border or wrap around the tile.
            acc = acc + _roll_lanes(y[k * cout : (k + 1) * cout, :], -off) * masks[k]
    else:
        acc = jnp.zeros((cout, n), jnp.float32)
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            yk = _dot_bf16(w3_ref[k * cout : (k + 1) * cout, :], h2[:])
            acc = acc + _roll_lanes(yk, -off) * masks[k]
    return (acc + b3_ref[:, 0:1]) * jnp.exp(l3_ref[:, 0:1] * 3.0)


def _make_kernel(reverse, tb, hh, ww, c, hidden, affine):
    ch = c // 2
    cout = c if affine else ch
    n = tb * hh * ww

    def kernel(z_ref, wt_ref, anb_ref, anl_ref, w1_ref, a1b_ref, a1l_ref,
               w2_ref, a2b_ref, a2l_ref, w3_ref, b3_ref, l3_ref,
               zn_ref, ld_ref, p1, h1, h2):
        masks = _border_masks(hh, ww, n)
        z = z_ref[:]
        if not reverse:
            z = (z + anb_ref[:, 0:1]) * jnp.exp(anl_ref[:, 0:1])  # actnorm
            z = jnp.dot(wt_ref[:], z, preferred_element_type=jnp.float32,
                        precision=HIGHEST)                        # mix
        z1, z2 = z[:ch, :], z[ch:, :]
        h = _net_T(z1, w1_ref, a1b_ref, a1l_ref, w2_ref, a2b_ref, a2l_ref,
                   w3_ref, b3_ref, l3_ref, p1, h1, h2, masks,
                   hh, ww, ch, cout)
        if affine:
            shift, raw = h[:ch, :], h[ch:, :]
            s = jax.nn.sigmoid(raw + 2.0)
            z2 = (z2 + shift) * s if not reverse else z2 / s - shift
        else:
            z2 = z2 + h if not reverse else z2 - h
        zn = jnp.concatenate([z1, z2], axis=0)
        if reverse:
            zn = jnp.dot(wt_ref[:], zn, preferred_element_type=jnp.float32,
                         precision=HIGHEST)                       # W^-1 mix
            zn = zn * jnp.exp(-anl_ref[:, 0:1]) - anb_ref[:, 0:1]
        zn_ref[:] = zn
        if affine and not reverse:
            # Per-image logdet: reduce sublanes, then fold each image's
            # pixel lanes with a 0/1 selection matmul (lane reshapes of the
            # pixel axis are not Mosaic-friendly).  log_sigmoid, not
            # log(sigmoid): stable value AND gradient at saturated scales.
            colsum = jnp.sum(
                jax.nn.log_sigmoid(raw + 2.0), axis=0, keepdims=True
            )  # (1, n)
            img = jax.lax.broadcasted_iota(jnp.int32, (tb, n), 1) // (hh * ww)
            sel = (
                img == jax.lax.broadcasted_iota(jnp.int32, (tb, n), 0)
            ).astype(jnp.float32)
            ld = jax.lax.dot_general(
                sel, colsum, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (tb, 1)
            ld_ref[pl.ds(pl.program_id(0) * tb, tb), :] = jnp.broadcast_to(
                ld, (tb, 128)
            )
        else:
            ld_ref[pl.ds(pl.program_id(0) * tb, tb), :] = jnp.zeros(
                (tb, 128), jnp.float32
            )

    return kernel


# ---------------------------------------------------------------------------
# pallas_call wrapper (+ GSPMD custom_partitioning: pixel/batch-parallel)
# ---------------------------------------------------------------------------


# ---------------------------------------------------------------------------
# Halo-tiled variant: one tile = an R-row band of ONE image (for levels whose
# whole image exceeds the VMEM budget, e.g. 128x128/64x64 of 256x256 configs).
# The kernel sees three consecutive z blocks (prev/cur/next via shifted,
# clamped index maps), assembles an (R+4)-row extended region in scratch, and
# runs the SAME math as the whole-image kernel on it — the coupling net's
# receptive field is 2 rows (two 3x3 convs), so every tap of a center-row
# output lands inside the extended region.  Border masks use ABSOLUTE image
# rows, which also zeroes taps into the clamped/foreign-image halo rows.
# The BACKWARD has a matching halo variant (`_make_bwd_kernel_halo` below):
# its cotangent scatter emits per-tile top/bottom halo-gradient outputs that
# one XLA shift-and-add folds into the neighbouring bands, so 256² training
# runs fully fused too.
# ---------------------------------------------------------------------------


def _halo_masks(row0, ww: int, hh: int, n: int):
    """Like _border_masks but for an extended row band: `row0` is the
    (traced) absolute image row of the buffer's first row; rows outside
    [0, hh) — clamped halo / neighbouring image — mask to zero."""
    idx = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    x = idx % ww
    y = row0 + idx // ww
    masks = []
    for dy, dx in OFFSETS:
        ok_y = jnp.logical_and(y + dy - 1 >= 0, y + dy - 1 < hh)
        ok_x = jnp.logical_and(x + dx - 1 >= 0, x + dx - 1 < ww)
        masks.append(jnp.logical_and(ok_y, ok_x).astype(jnp.float32))
    return masks


def _make_kernel_halo(reverse, R, T, hh, ww, c, hidden, affine):
    ch = c // 2
    cout = c if affine else ch
    n = (R + 4) * ww  # extended compute region
    pad = 2 * ww

    def kernel(zc_ref, zp_ref, zx_ref, wt_ref, anb_ref, anl_ref, w1_ref,
               a1b_ref, a1l_ref, w2_ref, a2b_ref, a2l_ref, w3_ref, b3_ref,
               l3_ref, zo_ref, ld_ref, p1, h1, h2, ext):
        i = pl.program_id(0)
        row0 = (i % T) * R - 2
        masks = _halo_masks(row0, ww, hh, n)
        ext[:, :pad] = zp_ref[:, (R - 2) * ww :]
        ext[:, pad : pad + R * ww] = zc_ref[:]
        ext[:, pad + R * ww :] = zx_ref[:, : pad]
        z = ext[:]
        if not reverse:
            z = (z + anb_ref[:, 0:1]) * jnp.exp(anl_ref[:, 0:1])
            z = jnp.dot(wt_ref[:], z, preferred_element_type=jnp.float32,
                        precision=HIGHEST)
        z1, z2 = z[:ch, :], z[ch:, :]
        h = _net_T(z1, w1_ref, a1b_ref, a1l_ref, w2_ref, a2b_ref, a2l_ref,
                   w3_ref, b3_ref, l3_ref, p1, h1, h2, masks,
                   hh, ww, ch, cout)
        if affine:
            shift, raw = h[:ch, :], h[ch:, :]
            s = jax.nn.sigmoid(raw + 2.0)
            z2 = (z2 + shift) * s if not reverse else z2 / s - shift
        else:
            z2 = z2 + h if not reverse else z2 - h
        zn = jnp.concatenate([z1, z2], axis=0)
        if reverse:
            zn = jnp.dot(wt_ref[:], zn, preferred_element_type=jnp.float32,
                         precision=HIGHEST)
            zn = zn * jnp.exp(-anl_ref[:, 0:1]) - anb_ref[:, 0:1]
        zo_ref[:] = zn[:, pad : pad + R * ww]

        @pl.when(i == 0)
        def _():
            ld_ref[:] = jnp.zeros_like(ld_ref)

        if affine and not reverse:
            # This tile's logdet contribution: log s over CENTER columns
            # only (halo rows belong to other tiles), accumulated into the
            # tile's image row.
            col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
            center = jnp.logical_and(col >= pad, col < pad + R * ww)
            contrib = jnp.sum(
                jax.nn.log_sigmoid(raw + 2.0) * center.astype(jnp.float32)
            )
            img = i // T
            ld_ref[pl.ds(img, 1), :] = ld_ref[pl.ds(img, 1), :] + contrib

    return kernel


def _step_raw_halo(reverse, affine, hh, ww, b, zt, *weights):
    c, total = zt.shape
    ch = c // 2
    cout = c if affine else ch
    hidden = weights[3].shape[0]
    R = _halo_rows(hh, ww, c, hidden, affine)
    assert R is not None, (hh, ww, c, hidden)
    T = hh // R
    G = b * T
    n = R * ww
    n_ext = (R + 4) * ww
    kernel = _make_kernel_halo(reverse, R, T, hh, ww, c, hidden, affine)

    rep = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    zcur = pl.BlockSpec((c, n), lambda i: (0, i), memory_space=pltpu.VMEM)
    zprev = pl.BlockSpec(
        (c, n), lambda i: (0, jnp.maximum(i - 1, 0)), memory_space=pltpu.VMEM
    )
    znext = pl.BlockSpec(
        (c, n), lambda i: (0, jnp.minimum(i + 1, G - 1)),
        memory_space=pltpu.VMEM,
    )
    flops_net = 2 * total * hidden * (9 * ch + hidden + 9 * cout)
    zn, ld = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[zcur, zprev, znext] + [rep(w.shape) for w in weights],
        out_specs=[
            zcur,
            pl.BlockSpec((b, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, total), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9 * ch, n_ext), COUPLING_DTYPE),   # p1 patches
            pltpu.VMEM((hidden, n_ext), COUPLING_DTYPE),   # h1
            pltpu.VMEM((hidden, n_ext), COUPLING_DTYPE),   # h2
            pltpu.VMEM((c, n_ext), jnp.float32),           # ext region
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=flops_net + 4 * total * c * c,
            bytes_accessed=4 * 4 * total * c,
            transcendentals=total * ch,
        ),
    )(zt, zt, zt, *weights)
    return zn, ld


def _step_raw(reverse, affine, hh, ww, b, zt, *weights):
    """zt (C, B*H*W) image-major -> (zt_next, ld (B, 128))."""
    c, total = zt.shape
    ch = c // 2
    cout = c if affine else ch
    hidden = weights[3].shape[0]  # w1T (hidden, 9*ch)
    if not _whole_image_ok(hh, ww, c, hidden, b, affine):
        return _step_raw_halo(reverse, affine, hh, ww, b, zt, *weights)
    tb = _tile_batch(b, hh, ww, c, hidden, affine)
    n = tb * hh * ww
    kernel = _make_kernel(reverse, tb, hh, ww, c, hidden, affine)

    grid = (b // tb,)
    rep = lambda shape: pl.BlockSpec(  # noqa: E731 — weights, replicated
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    zspec = pl.BlockSpec((c, n), lambda i: (0, i), memory_space=pltpu.VMEM)
    flops_net = 2 * total * hidden * (9 * ch + hidden + 9 * cout)
    zn, ld = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[zspec] + [rep(wgt.shape) for wgt in weights],
        out_specs=[
            zspec,
            # Full-array block (tiny: B x 128 f32): per-tile slices would
            # violate the (8, 128) tiling rule, so every grid step writes
            # its own row range; only lane 0 carries the value.
            pl.BlockSpec((b, 128), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((c, total), jnp.float32),
            jax.ShapeDtypeStruct((b, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((9 * ch, n), COUPLING_DTYPE),   # p1 patches
            pltpu.VMEM((hidden, n), COUPLING_DTYPE),   # h1
            pltpu.VMEM((hidden, n), COUPLING_DTYPE),   # h2
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=flops_net + 4 * total * c * c,
            bytes_accessed=2 * 4 * total * c,
            transcendentals=total * ch,
        ),
    )(zt, *weights)
    return zn, ld


_N_WEIGHTS = 12


def _shardings(mesh, arg_shapes):
    spec = arg_shapes[0].sharding.spec
    col = spec[1] if len(spec) > 1 else None
    return NamedSharding(mesh, P(None, col)), NamedSharding(mesh, P(col, None))


@functools.lru_cache(maxsize=None)
def _partitioned(reverse: bool, affine: bool, hh: int, ww: int, b: int):
    raw = functools.partial(_step_raw, reverse, affine, hh, ww, b)
    cp = custom_partitioning(raw)

    def infer(mesh, arg_shapes, result_shape):
        return _shardings(mesh, arg_shapes)

    def partition(mesh, arg_shapes, result_shape):
        zn_sh, ld_sh = _shardings(mesh, arg_shapes)
        spec = arg_shapes[0].sharding.spec
        col = spec[1] if len(spec) > 1 else None
        nshards = 1
        if col is not None:
            ax = (col,) if isinstance(col, str) else tuple(col)
            for a in ax:
                nshards *= mesh.shape[a]
        assert b % nshards == 0, (b, nshards)
        local = functools.partial(_step_raw, reverse, affine, hh, ww, b // nshards)
        rep = NamedSharding(mesh, P())
        arg_sh = (zn_sh,) + (rep,) * _N_WEIGHTS
        return mesh, local, (zn_sh, ld_sh), arg_sh

    wfac = ", ".join(f"w{i}a w{i}b" for i in range(_N_WEIGHTS))
    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=f"c n, {wfac} -> c n, b l",
    )
    return cp


# ---------------------------------------------------------------------------
# Fused BACKWARD kernel (training path)
#
# Gradient of the forward step w.r.t. (z, the 12 packed weight operands),
# given cotangents (g_zn, g_ld).  The forward is RECOMPUTED inside the
# kernel (storing h1/h2 residuals would reintroduce the ~134 MB/step of HBM
# traffic the fused forward exists to eliminate); every intermediate and
# every gradient stays in VMEM.  Weight gradients accumulate across grid
# steps in constant-index output blocks (sequential TPU grid), and under
# GSPMD the partial sums are psum'd over the batch-sharding axis inside the
# custom_partitioning body.
# ---------------------------------------------------------------------------


def _bwd_bytes_per_col(c: int, hidden: int) -> int:
    """VMEM bytes per pixel column for the backward kernel: two f32 hidden
    scratches (gradient ping-pong) + bf16 h1/h2/p1 recompute scratches +
    f32 u/v/acc/g_p1 + double-buffered in/out z-blocks."""
    ch = c // 2
    return (
        2 * hidden * 4      # gh_a, gh_b (f32 gradient scratch, reused)
        + 2 * hidden * 2    # h1, h2 (bf16)
        + 9 * ch * 2        # p1 (bf16)
        + 9 * ch * 4        # g_p1 (f32)
        + 9 * c * 2         # g_y tap-packed conv3 cotangents (bf16)
        + 3 * c * 4         # u, v, acc(<=c)
        + 2 * (3 * c + 1) * 4 * 2  # z, g_zn, g_z blocks + gld, double-buffered
    )


# The backward runs one phase at a time, so its live set is closer to the
# byte/column model than the forward's (fewer concurrent transients); budget
# most of the 16 MB.  The flagship level-0 tile (one 32x32 image, 1024
# columns, ~7.2 KB/col) MUST fit — below ~10 MB of column budget the whole
# level falls back to the XLA vjp and the fused training path loses its
# biggest win (73% of step time is level 0).
_BWD_TOTAL_VMEM = 13 * 2**20


def _bwd_fixed_bytes(c: int, hidden: int, affine: bool = True) -> int:
    """VMEM resident across the whole backward grid: the bf16 weights + the
    f32 weight-grad accumulator blocks (constant-index outputs) + the f32
    mix matrix and its grad.  SHAPE-DEPENDENT: at the deep 256²-config
    levels (c=384: w3 is (3456, 512)) this alone exceeds the 16 MB scoped
    limit — measured as a Mosaic stack OOM on v5e — so feasibility must
    price it per config, not as a flat constant."""
    ch = c // 2
    cout = c if affine else ch
    w1 = hidden * 9 * ch
    w2 = hidden * hidden
    w3 = 9 * cout * hidden
    return (
        (w1 + w2 + w3) * (2 + 4)   # bf16 weights + f32 grad accumulators
        + 2 * c * c * 4            # mix matrix + its f32 grad
        + 24 * max(c, hidden) * 4  # column vectors (biases/logs + grads)
    )


def _bwd_max_cols(c: int, hidden: int, affine: bool = True) -> int:
    budget = _BWD_TOTAL_VMEM - _bwd_fixed_bytes(c, hidden, affine)
    if budget <= 0:
        return 0
    return min(MAX_TILE_COLS, budget // _bwd_bytes_per_col(c, hidden))


def _bwd_whole_image_ok(h: int, w: int, c: int, hidden: int,
                        b: int | None = None, affine: bool = True) -> bool:
    """Whole-image backward tiling feasible?  With `b` given, also verifies
    a feasible tile exists: either a divisor of b whose tile is lane-aligned
    (128 columns) and under the cap, or a single full tile covering the
    whole array — `_bwd_tile_batch` falls back to tb=b when no aligned
    divisor fits, and that full tile is only legal when it actually fits
    VMEM (advisor round-2 item)."""
    cap = _bwd_max_cols(c, hidden, affine)
    if h * w > cap:
        return False
    if b is None:
        return True
    hw = h * w
    if b * hw <= cap:
        return True  # single full tile always legal
    return any(
        b % d == 0 and (d * hw) % 128 == 0 and d * hw <= cap
        for d in range(1, b + 1)
    )


def _bwd_halo_bytes_per_col(c: int, hidden: int, affine: bool) -> int:
    """VMEM bytes per EXTENDED column for the halo backward: the whole-image
    backward's scratches plus the halo-only ext/g_out-ext assembly scratches
    and the extra prev/next z input blocks."""
    ch = c // 2
    cout = c if affine else ch
    return (
        2 * hidden * 4      # gh_a, gh_b (f32 gradient ping-pong)
        + 2 * hidden * 2    # h1, h2 (bf16)
        + 9 * ch * 2        # p1 (bf16)
        + 9 * ch * 4        # g_p1 (f32 transient)
        + 9 * cout * 2      # gy tap-packed conv3 cotangents (bf16)
        + 2 * c * 4         # ext + g_out-ext assembly scratches (f32)
        + 3 * c * 4         # u, v, acc transients
        + 10 * c * 4        # z prev/cur/next + gzn in, gz/top/bot out,
                            # double-buffered (counted per ext col: conservative)
    )


# The halo backward's byte/column model underestimates Mosaic's real stack
# use by up to ~30% at small c (measured: additive 128²·c12 with R=8 =
# 1536 ext cols compiled to a 17.29 MB scoped allocation vs the 16 MB
# limit, while R=4 — what the affine variant of the same level selects —
# runs in production).  Derate the halo budget so the chooser stays on the
# hardware-proven side of that cliff instead of trusting the model at the
# boundary.
_BWD_HALO_VMEM = 10 * 2**20


def _bwd_halo_rows(hh: int, ww: int, c: int, hidden: int,
                   affine: bool) -> int | None:
    """Rows-per-tile R for the halo-tiled BACKWARD (same tiling contract as
    the forward's `_halo_rows`: R divides hh, R >= 4, lane-aligned center,
    (R+4)-row extended region within the backward VMEM budget)."""
    budget = _BWD_HALO_VMEM - _bwd_fixed_bytes(c, hidden, affine)
    if budget <= 0:
        return None
    cap = min(MAX_TILE_COLS, budget // _bwd_halo_bytes_per_col(c, hidden, affine))
    best = None
    for r in range(4, hh):
        if hh % r or (r * ww) % 128:
            continue
        if (r + 4) * ww <= cap:
            best = r
    return best


def backward_supported(h: int, w: int, c: int, hidden: int,
                       b: int | None = None, affine: bool = True) -> bool:
    """True when SOME fused backward tiling exists: whole-image batch tiles,
    or halo row-bands (256²-config levels whose image exceeds the budget)."""
    if _bwd_whole_image_ok(h, w, c, hidden, b, affine):
        return True
    return _bwd_halo_rows(h, w, c, hidden, affine) is not None


def _bwd_tile_batch(b: int, h: int, w: int, c: int, hidden: int,
                    affine: bool = True) -> int:
    hw = h * w
    cap = _bwd_max_cols(c, hidden, affine)
    best = None
    for d in range(1, b + 1):
        if b % d:
            continue
        if (d * hw) % 128 == 0 and d * hw <= cap:
            if best is None or abs(d * hw - cap) < abs(best * hw - cap):
                best = d
    return best if best is not None else b


def _rowsum(x) -> jax.Array:
    """(r, n) -> (r, 1) f32 lane reduction."""
    return jnp.sum(x.astype(jnp.float32), axis=1, keepdims=True)


def _make_bwd_kernel(tb, hh, ww, c, hidden, affine):
    ch = c // 2
    cout = c if affine else ch
    n = tb * hh * ww

    def kernel(z_ref, wt_ref, anb_ref, anl_ref, w1_ref, a1b_ref, a1l_ref,
               w2_ref, a2b_ref, a2l_ref, w3_ref, b3_ref, l3_ref,
               gzn_ref, gld_ref,
               gz_ref, gwt_ref, ganb_ref, ganl_ref, gw1_ref, ga1b_ref,
               ga1l_ref, gw2_ref, ga2b_ref, ga2l_ref, gw3_ref, gb3_ref,
               gl3_ref,
               p1, h1, h2, gh_a, gh_b, gy):
        masks = _border_masks(hh, ww, n)

        # ---- recompute forward (identical math to _make_kernel) ----------
        z = z_ref[:]
        u = (z + anb_ref[:, 0:1]) * jnp.exp(anl_ref[:, 0:1])      # actnorm
        v = jnp.dot(wt_ref[:], u, preferred_element_type=jnp.float32,
                    precision=HIGHEST)                            # mix
        v1, v2 = v[:ch, :], v[ch:, :]
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            tap = _roll_lanes(v1, -off)
            p1[k * ch : (k + 1) * ch, :] = (tap * masks[k]).astype(COUPLING_DTYPE)
        a = _dot_bf16(w1_ref[:], p1[:])
        a = (a + a1b_ref[:, 0:1]) * jnp.exp(a1l_ref[:, 0:1])
        h1[:] = jnp.maximum(a, 0.0).astype(COUPLING_DTYPE)
        a = _dot_bf16(w2_ref[:], h1[:])
        a = (a + a2b_ref[:, 0:1]) * jnp.exp(a2l_ref[:, 0:1])
        h2[:] = jnp.maximum(a, 0.0).astype(COUPLING_DTYPE)
        # conv3 recompute stays TAP-SEPARATE here: the packed variant that
        # wins 24% in the forward kernel measured a ~25x REGRESSION inside
        # this (much larger) kernel — the extra live (9*cout, n) f32 pushes
        # Mosaic into a pathological schedule.  The recompute is ~10% of
        # backward FLOPs, so slim matmuls cost little.
        acc = jnp.zeros((cout, n), jnp.float32)
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            yk = _dot_bf16(w3_ref[k * cout : (k + 1) * cout, :], h2[:])
            acc = acc + _roll_lanes(yk, -off) * masks[k]
        e3l3 = jnp.exp(l3_ref[:, 0:1] * 3.0)
        out = (acc + b3_ref[:, 0:1]) * e3l3

        # ---- backward through shift/scale --------------------------------
        gzn = gzn_ref[:]
        go1, go2 = gzn[:ch, :], gzn[ch:, :]
        if affine:
            shift, raw = out[:ch, :], out[ch:, :]
            s = jax.nn.sigmoid(raw + 2.0)
            # Analytically-fused cotangent: the naive g_s = ... + gld/s then
            # * s*(1-s) computes inf*0 = NaN once s saturates to 0; the
            # fused form  gld*(1-s)  is finite everywhere (= d/draw of
            # log_sigmoid, matching the forward's logdet term).
            g_raw = (
                go2 * (v2 + shift) * (s * (1.0 - s))
                + gld_ref[0:1, :] * (1.0 - s)
            )
            g_v2 = go2 * s
            g_out = jnp.concatenate([g_v2, g_raw], axis=0)  # g_shift == g_v2
        else:
            g_v2 = go2
            g_out = go2

        # ---- conv3 (zeros conv with exp(3*logs) output scale) -------------
        g_acc = g_out * e3l3
        gb3 = _rowsum(g_acc)
        gl3 = 3.0 * _rowsum(g_out * out)
        # Tap-PACKED backward: stack the 9 rolled cotangents into one
        # (9*cout, n) operand so g_h2 contracts over 9*cout (~108) instead
        # of 9 separate cout (~12)-deep matmuls — a 12-deep contraction
        # fills <10% of the MXU's K dimension.  Filled via scratch stores
        # (one jnp.concatenate of 9 rolls sends Mosaic compile >10 min).
        # The same stacked operand feeds g_w3 in one matmul (below).
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            gy[k * cout : (k + 1) * cout, :] = _roll_lanes(
                g_acc * masks[k], off
            ).astype(COUPLING_DTYPE)
        gh_a[:] = jax.lax.dot_general(  # g_h2 = W3_packed^T @ g_y
            w3_ref[:], gy[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # ---- conv2 (1x1 + actnorm + relu) ---------------------------------
        h2f = h2[:].astype(jnp.float32)
        g_a2n = gh_a[:] * (h2f > 0.0)
        g_a2 = g_a2n * jnp.exp(a2l_ref[:, 0:1])
        ga2b = _rowsum(g_a2)
        ga2l = _rowsum(g_a2n * h2f)   # a2n == h2 wherever the relu passes
        gh_b[:] = jax.lax.dot_general(  # g_h1 = w2^T @ g_a2
            w2_ref[:], g_a2.astype(COUPLING_DTYPE),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # ---- conv1 (3x3 patches + actnorm + relu) --------------------------
        h1f = h1[:].astype(jnp.float32)
        g_a1n = gh_b[:] * (h1f > 0.0)
        g_a1 = g_a1n * jnp.exp(a1l_ref[:, 0:1])
        ga1b = _rowsum(g_a1)
        ga1l = _rowsum(g_a1n * h1f)
        g_a1_bf = g_a1.astype(COUPLING_DTYPE)
        g_p1 = jax.lax.dot_general(  # (9*ch, n) = w1^T @ g_a1
            w1_ref[:], g_a1_bf,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_v1 = go1
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            g_v1 = g_v1 + _roll_lanes(
                g_p1[k * ch : (k + 1) * ch, :] * masks[k], off
            )

        # ---- mix + actnorm --------------------------------------------------
        g_v = jnp.concatenate([g_v1, g_v2], axis=0)
        g_u = jax.lax.dot_general(  # W^T @ g_v
            wt_ref[:], g_v,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGHEST,
        )
        gz_ref[:] = g_u * jnp.exp(anl_ref[:, 0:1])
        ganb = _rowsum(gz_ref[:])
        ganl = _rowsum(g_u * u)

        # ---- weight-grad tile contributions (accumulate over the grid) ----
        h2bf, h1bf = h2[:], h1[:]
        contribs = [
            (gwt_ref, jax.lax.dot_general(  # g_W = g_v @ u^T
                g_v, u, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HIGHEST)),
            (ganb_ref, ganb),
            (ganl_ref, ganl),
            (gw1_ref, jax.lax.dot_general(  # (hidden, 9ch) = g_a1 @ p1^T
                g_a1_bf, p1[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)),
            (ga1b_ref, ga1b),
            (ga1l_ref, ga1l),
            (gw2_ref, jax.lax.dot_general(  # (hidden, hidden) = g_a2 @ h1^T
                g_a2.astype(COUPLING_DTYPE), h1bf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)),
            (ga2b_ref, ga2b),
            (ga2l_ref, ga2l),
            (gb3_ref, gb3),
            (gl3_ref, gl3),
        ]
        contribs.append((gw3_ref, jax.lax.dot_general(  # (9*cout, hidden)
            gy[:], h2bf, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)))

        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            for ref, val in contribs:
                ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            for ref, val in contribs:
                ref[:] = ref[:] + val

    return kernel


# ---------------------------------------------------------------------------
# Halo-tiled BACKWARD (levels whose whole image exceeds the backward VMEM
# budget — the 128²/64²/32² levels of 256² configs).  Mirrors the forward's
# prev/cur/next BlockSpec trick: each tile recomputes the forward on its
# (R+4)-row extended region and backpropagates ONLY its own center-band
# output cotangents through it.  The resulting input gradient covers the
# full extended region: the center slice is written in place, and the
# 2-row top/bottom halo contributions (this tile's outputs' gradient w.r.t.
# its neighbours' rows) are emitted as separate per-tile outputs that one
# cheap XLA shift-and-add folds into the neighbouring bands afterwards.
# Absolute-row masks make foreign-image/out-of-image gradients exactly zero,
# so the cross-boundary adds are no-ops there.  Weight gradients accumulate
# across grid steps exactly like the whole-image backward — per-tile
# contributions are the tile-local cotangent sums, and summing them over
# the (sequential) grid reproduces the full-batch sums exactly.
# ---------------------------------------------------------------------------


def _make_bwd_kernel_halo(R, T, hh, ww, c, hidden, affine):
    ch = c // 2
    cout = c if affine else ch
    n = (R + 4) * ww  # extended compute region
    nc = R * ww       # center band
    pad = 2 * ww
    # Mosaic requires output block lane dims divisible by 128 (or equal to
    # the whole array); pad the per-tile halo blocks up and zero the tail.
    pb = -(-pad // 128) * 128

    def kernel(zc_ref, zp_ref, zx_ref, wt_ref, anb_ref, anl_ref, w1_ref,
               a1b_ref, a1l_ref, w2_ref, a2b_ref, a2l_ref, w3_ref, b3_ref,
               l3_ref, gzn_ref, gld_ref,
               gz_ref, gtop_ref, gbot_ref,
               gwt_ref, ganb_ref, ganl_ref, gw1_ref, ga1b_ref,
               ga1l_ref, gw2_ref, ga2b_ref, ga2l_ref, gw3_ref, gb3_ref,
               gl3_ref,
               p1, h1, h2, gh_a, gh_b, gy, ext, goe):
        i = pl.program_id(0)
        row0 = (i % T) * R - 2
        masks = _halo_masks(row0, ww, hh, n)
        col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
        center = jnp.logical_and(col >= pad, col < pad + nc).astype(jnp.float32)

        # ---- assemble ext input and ext output-cotangent ------------------
        # (cotangent is zero on halo columns: those outputs belong to — and
        # are backpropagated by — the neighbouring tiles.)
        ext[:, :pad] = zp_ref[:, (R - 2) * ww :]
        ext[:, pad : pad + nc] = zc_ref[:]
        ext[:, pad + nc :] = zx_ref[:, :pad]
        goe[:, :pad] = jnp.zeros((c, pad), jnp.float32)
        goe[:, pad : pad + nc] = gzn_ref[:]
        goe[:, pad + nc :] = jnp.zeros((c, pad), jnp.float32)

        # ---- recompute forward on the ext region (same math as fwd halo) --
        z = ext[:]
        u = (z + anb_ref[:, 0:1]) * jnp.exp(anl_ref[:, 0:1])      # actnorm
        v = jnp.dot(wt_ref[:], u, preferred_element_type=jnp.float32,
                    precision=HIGHEST)                            # mix
        v1, v2 = v[:ch, :], v[ch:, :]
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            tap = _roll_lanes(v1, -off)
            p1[k * ch : (k + 1) * ch, :] = (tap * masks[k]).astype(COUPLING_DTYPE)
        a = _dot_bf16(w1_ref[:], p1[:])
        a = (a + a1b_ref[:, 0:1]) * jnp.exp(a1l_ref[:, 0:1])
        h1[:] = jnp.maximum(a, 0.0).astype(COUPLING_DTYPE)
        a = _dot_bf16(w2_ref[:], h1[:])
        a = (a + a2b_ref[:, 0:1]) * jnp.exp(a2l_ref[:, 0:1])
        h2[:] = jnp.maximum(a, 0.0).astype(COUPLING_DTYPE)
        # conv3 recompute tap-separate (see _make_bwd_kernel: the packed
        # variant regresses Mosaic's schedule in the large backward kernels).
        acc = jnp.zeros((cout, n), jnp.float32)
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            yk = _dot_bf16(w3_ref[k * cout : (k + 1) * cout, :], h2[:])
            acc = acc + _roll_lanes(yk, -off) * masks[k]
        e3l3 = jnp.exp(l3_ref[:, 0:1] * 3.0)
        out = (acc + b3_ref[:, 0:1]) * e3l3

        # ---- backward through shift/scale ---------------------------------
        gzn = goe[:]
        go1, go2 = gzn[:ch, :], gzn[ch:, :]
        if affine:
            shift, raw = out[:ch, :], out[ch:, :]
            s = jax.nn.sigmoid(raw + 2.0)
            # The logdet cotangent applies to CENTER columns only (the tile's
            # logdet contribution in the forward sums center columns); all
            # center columns of a tile share the image's scalar g_ld.
            g_raw = (
                go2 * (v2 + shift) * (s * (1.0 - s))
                + gld_ref[0, 0] * center * (1.0 - s)
            )
            g_v2 = go2 * s
            g_out = jnp.concatenate([g_v2, g_raw], axis=0)
        else:
            g_v2 = go2
            g_out = go2

        # ---- conv3 --------------------------------------------------------
        g_acc = g_out * e3l3
        gb3 = _rowsum(g_acc)
        gl3 = 3.0 * _rowsum(g_out * out)
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            gy[k * cout : (k + 1) * cout, :] = _roll_lanes(
                g_acc * masks[k], off
            ).astype(COUPLING_DTYPE)
        gh_a[:] = jax.lax.dot_general(  # g_h2 = W3_packed^T @ g_y
            w3_ref[:], gy[:],
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # ---- conv2 --------------------------------------------------------
        h2f = h2[:].astype(jnp.float32)
        g_a2n = gh_a[:] * (h2f > 0.0)
        g_a2 = g_a2n * jnp.exp(a2l_ref[:, 0:1])
        ga2b = _rowsum(g_a2)
        ga2l = _rowsum(g_a2n * h2f)
        gh_b[:] = jax.lax.dot_general(  # g_h1 = w2^T @ g_a2
            w2_ref[:], g_a2.astype(COUPLING_DTYPE),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

        # ---- conv1 --------------------------------------------------------
        h1f = h1[:].astype(jnp.float32)
        g_a1n = gh_b[:] * (h1f > 0.0)
        g_a1 = g_a1n * jnp.exp(a1l_ref[:, 0:1])
        ga1b = _rowsum(g_a1)
        ga1l = _rowsum(g_a1n * h1f)
        g_a1_bf = g_a1.astype(COUPLING_DTYPE)
        g_p1 = jax.lax.dot_general(  # (9*ch, n) = w1^T @ g_a1
            w1_ref[:], g_a1_bf,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        g_v1 = go1
        for k, (dy, dx) in enumerate(OFFSETS):
            off = (dy - 1) * ww + (dx - 1)
            g_v1 = g_v1 + _roll_lanes(
                g_p1[k * ch : (k + 1) * ch, :] * masks[k], off
            )

        # ---- mix + actnorm -------------------------------------------------
        g_v = jnp.concatenate([g_v1, g_v2], axis=0)
        g_u = jax.lax.dot_general(  # W^T @ g_v
            wt_ref[:], g_v,
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=HIGHEST,
        )
        gz_full = g_u * jnp.exp(anl_ref[:, 0:1])
        # Center slice in place; halo contributions to the neighbouring
        # bands as separate outputs (folded in by XLA afterwards).  The
        # absolute-row masks already zeroed gradients at out-of-image rows,
        # so a top band's gtop (and a bottom band's gbot) is exactly zero.
        gz_ref[:] = gz_full[:, pad : pad + nc]
        if pb == pad:
            gtop_ref[:] = gz_full[:, :pad]
            gbot_ref[:] = gz_full[:, pad + nc :]
        else:
            zfill = jnp.zeros((c, pb - pad), jnp.float32)
            gtop_ref[:] = jnp.concatenate([gz_full[:, :pad], zfill], axis=1)
            gbot_ref[:] = jnp.concatenate(
                [gz_full[:, pad + nc :], zfill], axis=1
            )
        ganb = _rowsum(gz_full)
        ganl = _rowsum(g_u * u)

        # ---- weight-grad tile contributions (accumulate over the grid) ----
        h2bf, h1bf = h2[:], h1[:]
        contribs = [
            (gwt_ref, jax.lax.dot_general(  # g_W = g_v @ u^T
                g_v, u, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=HIGHEST)),
            (ganb_ref, ganb),
            (ganl_ref, ganl),
            (gw1_ref, jax.lax.dot_general(  # (hidden, 9ch) = g_a1 @ p1^T
                g_a1_bf, p1[:], dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)),
            (ga1b_ref, ga1b),
            (ga1l_ref, ga1l),
            (gw2_ref, jax.lax.dot_general(  # (hidden, hidden) = g_a2 @ h1^T
                g_a2.astype(COUPLING_DTYPE), h1bf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)),
            (ga2b_ref, ga2b),
            (ga2l_ref, ga2l),
            (gb3_ref, gb3),
            (gl3_ref, gl3),
            (gw3_ref, jax.lax.dot_general(  # (9*cout, hidden)
                gy[:], h2bf, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)),
        ]

        first = pl.program_id(0) == 0

        @pl.when(first)
        def _():
            for ref, val in contribs:
                ref[:] = val

        @pl.when(jnp.logical_not(first))
        def _():
            for ref, val in contribs:
                ref[:] = ref[:] + val

    return kernel


def _bwd_raw_halo(affine, hh, ww, b, zt, *rest):
    weights, gzn, gld = rest[:_N_WEIGHTS], rest[_N_WEIGHTS], rest[_N_WEIGHTS + 1]
    c, total = zt.shape
    ch = c // 2
    cout = c if affine else ch
    hidden = weights[3].shape[0]
    R = _bwd_halo_rows(hh, ww, c, hidden, affine)
    assert R is not None, (hh, ww, c, hidden)
    T = hh // R
    G = b * T
    nc = R * ww
    n_ext = (R + 4) * ww
    pad = 2 * ww
    pb = -(-pad // 128) * 128  # lane-aligned halo output blocks
    kernel = _make_bwd_kernel_halo(R, T, hh, ww, c, hidden, affine)

    rep = lambda shape: pl.BlockSpec(  # noqa: E731
        shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    zcur = pl.BlockSpec((c, nc), lambda i: (0, i), memory_space=pltpu.VMEM)
    zprev = pl.BlockSpec(
        (c, nc), lambda i: (0, jnp.maximum(i - 1, 0)), memory_space=pltpu.VMEM
    )
    znext = pl.BlockSpec(
        (c, nc), lambda i: (0, jnp.minimum(i + 1, G - 1)),
        memory_space=pltpu.VMEM,
    )
    gldspec = pl.BlockSpec((1, nc), lambda i: (0, i), memory_space=pltpu.VMEM)
    halospec = pl.BlockSpec((c, pb), lambda i: (0, i), memory_space=pltpu.VMEM)
    grad_shapes = [
        (c, c), (c, 1), (c, 1), (hidden, 9 * ch), (hidden, 1), (hidden, 1),
        (hidden, hidden), (hidden, 1), (hidden, 1), (9 * cout, hidden),
        (cout, 1), (cout, 1),
    ]
    flops_net = 2 * total * hidden * (9 * ch + hidden + 9 * cout)
    outs = pl.pallas_call(
        kernel,
        grid=(G,),
        in_specs=[zcur, zprev, znext] + [rep(w.shape) for w in weights]
        + [zcur, gldspec],
        out_specs=[zcur, halospec, halospec] + [rep(s) for s in grad_shapes],
        out_shape=[
            jax.ShapeDtypeStruct((c, total), jnp.float32),
            jax.ShapeDtypeStruct((c, G * pb), jnp.float32),
            jax.ShapeDtypeStruct((c, G * pb), jnp.float32),
        ]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
        scratch_shapes=[
            pltpu.VMEM((9 * ch, n_ext), COUPLING_DTYPE),    # p1
            pltpu.VMEM((hidden, n_ext), COUPLING_DTYPE),    # h1
            pltpu.VMEM((hidden, n_ext), COUPLING_DTYPE),    # h2
            pltpu.VMEM((hidden, n_ext), jnp.float32),       # gh_a
            pltpu.VMEM((hidden, n_ext), jnp.float32),       # gh_b
            pltpu.VMEM((9 * cout, n_ext), COUPLING_DTYPE),  # gy
            pltpu.VMEM((c, n_ext), jnp.float32),            # ext input
            pltpu.VMEM((c, n_ext), jnp.float32),            # g_out ext
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_net + 12 * total * c * c,
            bytes_accessed=5 * 4 * total * c,
            transcendentals=2 * total * ch,
        ),
    )(zt, zt, zt, *weights, gzn, gld)
    gz, gtop, gbot = outs[0], outs[1], outs[2]
    # Fold each tile's halo contributions into the neighbouring bands:
    # tile i's TOP halo is the gradient w.r.t. the last 2 rows of band i-1,
    # its BOTTOM halo w.r.t. the first 2 rows of band i+1.  Cross-image
    # pairs add exact zeros (masked in-kernel).
    gz3 = gz.reshape(c, G, nc)
    gt3 = gtop.reshape(c, G, pb)[:, :, :pad]
    gb3 = gbot.reshape(c, G, pb)[:, :, :pad]
    gz3 = gz3.at[:, :-1, nc - pad :].add(gt3[:, 1:])
    gz3 = gz3.at[:, 1:, :pad].add(gb3[:, :-1])
    return (gz3.reshape(c, total),) + tuple(outs[3:])


def _bwd_raw(affine, hh, ww, b, zt, *rest):
    """(zt, *12 weights, g_zn, g_ldcol) -> (g_zt, *12 weight grads, f32)."""
    weights, gzn, gld = rest[:_N_WEIGHTS], rest[_N_WEIGHTS], rest[_N_WEIGHTS + 1]
    c, total = zt.shape
    ch = c // 2
    cout = c if affine else ch
    hidden = weights[3].shape[0]
    if not _bwd_whole_image_ok(hh, ww, c, hidden, b, affine):
        return _bwd_raw_halo(affine, hh, ww, b, zt, *rest)
    tb = _bwd_tile_batch(b, hh, ww, c, hidden, affine)
    n = tb * hh * ww
    kernel = _make_bwd_kernel(tb, hh, ww, c, hidden, affine)

    grid = (b // tb,)
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
    flops_net = 2 * total * hidden * (9 * ch + hidden + 9 * cout)
    outs = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[zspec] + [rep(w.shape) for w in weights] + [zspec, gldspec],
        out_specs=[zspec] + [rep(s) for s in grad_shapes],
        out_shape=[jax.ShapeDtypeStruct((c, total), jnp.float32)]
        + [jax.ShapeDtypeStruct(s, jnp.float32) for s in grad_shapes],
        scratch_shapes=[
            pltpu.VMEM((9 * ch, n), COUPLING_DTYPE),   # p1
            pltpu.VMEM((hidden, n), COUPLING_DTYPE),   # h1
            pltpu.VMEM((hidden, n), COUPLING_DTYPE),   # h2
            pltpu.VMEM((hidden, n), jnp.float32),    # gh_a
            pltpu.VMEM((hidden, n), jnp.float32),    # gh_b
            pltpu.VMEM((9 * cout, n), COUPLING_DTYPE),  # gy (tap-packed)
        ],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=3 * flops_net + 12 * total * c * c,
            bytes_accessed=3 * 4 * total * c,
            transcendentals=2 * total * ch,
        ),
    )(zt, *weights, gzn, gld)
    return tuple(outs)


@functools.lru_cache(maxsize=None)
def _partitioned_bwd(affine: bool, hh: int, ww: int, b: int):
    raw = functools.partial(_bwd_raw, affine, hh, ww, b)
    cp = custom_partitioning(raw)

    def _col(arg_shapes):
        spec = arg_shapes[0].sharding.spec
        return spec[1] if len(spec) > 1 else None

    def infer(mesh, arg_shapes, result_shape):
        col = _col(arg_shapes)
        zt_sh = NamedSharding(mesh, P(None, col))
        rep = NamedSharding(mesh, P())
        return (zt_sh,) + (rep,) * _N_WEIGHTS

    def partition(mesh, arg_shapes, result_shape):
        col = _col(arg_shapes)
        zt_sh = NamedSharding(mesh, P(None, col))
        rep = NamedSharding(mesh, P())
        nshards = 1
        axes: tuple = ()
        if col is not None:
            axes = (col,) if isinstance(col, str) else tuple(col)
            for a in axes:
                nshards *= mesh.shape[a]
        assert b % nshards == 0, (b, nshards)
        local_raw = functools.partial(_bwd_raw, affine, hh, ww, b // nshards)

        def local(zt, *rest):
            outs = local_raw(zt, *rest)
            if axes:
                # Weight grads are partial sums over the sharded pixel axis.
                outs = (outs[0],) + tuple(
                    jax.lax.psum(o, axes) for o in outs[1:]
                )
            return outs

        arg_sh = (zt_sh,) + (rep,) * _N_WEIGHTS + (zt_sh, zt_sh)
        out_sh = (zt_sh,) + (rep,) * _N_WEIGHTS
        return mesh, local, out_sh, arg_sh

    wfac = ", ".join(f"w{i}a w{i}b" for i in range(_N_WEIGHTS))
    gfac = ", ".join(f"w{i}a w{i}b" for i in range(_N_WEIGHTS))
    cp.def_partition(
        partition=partition,
        infer_sharding_from_operands=infer,
        sharding_rule=f"c n, {wfac}, c n, one n -> c n, {gfac}",
    )
    return cp


def step_backward_t(
    packed, zt: jax.Array, g_zn: jax.Array, g_ld: jax.Array,
    hw, b: int, affine: bool,
):
    """Fused backward: cotangents w.r.t. (the 12 packed weights, zt).

    `g_ld` is the per-image logdet cotangent (B,); expanded to one value per
    pixel column outside the kernel (cheap: one f32 row)."""
    pixels = hw[0] * hw[1]
    gld_col = jnp.repeat(g_ld.astype(jnp.float32), pixels)[None, :]
    outs = _partitioned_bwd(affine, hw[0], hw[1], b)(
        zt, *packed, g_zn, gld_col
    )
    g_zt, g_packed = outs[0], outs[1:]
    # Match the packed operands' dtypes/shapes (column vectors -> (r,) rows
    # stay (r,1) in packing, bf16 weights take bf16 cotangents exactly like
    # the XLA path's conv-transpose gradients).
    g_packed = tuple(
        g.astype(w.dtype) for g, w in zip(g_packed, packed)
    )
    return g_packed, g_zt


# ---------------------------------------------------------------------------
# Param packing (original step-param pytree -> kernel operand list)
# ---------------------------------------------------------------------------


def _cross_perm(cout: int, affine: bool):
    """Row order turning the kernel's contiguous [shift | raw] layout into
    the reference's cross split (shift = even, raw = odd channels)."""
    if not affine:
        return list(range(cout))
    ch = cout // 2
    return [2 * j for j in range(ch)] + [2 * j + 1 for j in range(ch)]


def pack_weights(sp, kind: str, affine: bool, reverse: bool) -> list[jax.Array]:
    """-> the 12 kernel weight operands (transposed layout) from one step's
    param dict."""
    from pytorch_glow_tpu.ops import invconv_xla as ic

    if kind == "lu":
        wmat = ic.lu_inverse(sp["perm"]["lu"]) if reverse else ic.lu_assemble(
            sp["perm"]["lu"]
        )
    elif kind == "plain":
        wmat = jnp.linalg.inv(sp["perm"]["w"]) if reverse else sp["perm"]["w"]
    else:  # fixed permutation as a 0/1 matrix
        idx = sp["perm"]["inv_idx" if reverse else "idx"]
        wmat = jax.nn.one_hot(idx, idx.shape[0], dtype=jnp.float32)
    cp = sp["coupling"]
    hidden = cp["conv1"]["w"].shape[-1]
    cout = cp["conv3"]["w"].shape[-1]
    perm = jnp.asarray(_cross_perm(cout, affine))
    # (3,3,hid,cout) -> rows (tap, cout-reordered), cols hid: (9*cout, hid)
    w3 = cp["conv3"]["w"][..., perm]
    w3t = jnp.transpose(w3, (0, 1, 3, 2)).reshape(9 * cout, hidden)
    # (3,3,cin,hid) -> rows hid, cols (tap, cin): (hid, 9*cin)
    w1 = cp["conv1"]["w"]
    cin = w1.shape[2]
    w1t = jnp.transpose(w1, (3, 0, 1, 2)).reshape(hidden, 9 * cin)
    col = lambda v: v[:, None].astype(jnp.float32)  # noqa: E731
    return [
        wmat.astype(jnp.float32),               # z' = W @ z
        col(sp["actnorm"]["bias"]),
        col(sp["actnorm"]["logs"]),
        w1t.astype(COUPLING_DTYPE),
        col(cp["conv1"]["actnorm"]["bias"]),
        col(cp["conv1"]["actnorm"]["logs"]),
        cp["conv2"]["w"].reshape(hidden, hidden).T.astype(COUPLING_DTYPE),
        col(cp["conv2"]["actnorm"]["bias"]),
        col(cp["conv2"]["actnorm"]["logs"]),
        w3t.astype(COUPLING_DTYPE),
        col(cp["conv3"]["b"][perm]),
        col(cp["conv3"]["logs"][perm]),
    ]


def param_logdet(sp, kind: str) -> jax.Array:
    """Per-pixel logdet of actnorm + permutation for ONE step (the z-free
    terms the kernel does not emit); multiply by H*W and sum over K outside."""
    from pytorch_glow_tpu.ops import invconv_xla as ic

    ld = jnp.sum(sp["actnorm"]["logs"])
    if kind == "lu":
        ld = ld + ic.lu_logdet(sp["perm"]["lu"])
    elif kind == "plain":
        ld = ld + jnp.linalg.slogdet(sp["perm"]["w"])[1]
    return ld


# ---------------------------------------------------------------------------
# Public entry points
# ---------------------------------------------------------------------------


def to_t(z: jax.Array) -> jax.Array:
    """NHWC -> transposed kernel layout (C, B*H*W), image-major pixels."""
    b, h, w, c = z.shape
    return z.reshape(b * h * w, c).T


def from_t(zt: jax.Array, shape) -> jax.Array:
    b, h, w, c = shape
    return zt.T.reshape(b, h, w, c)


def step_forward_t(sp, zt: jax.Array, hw, b: int, kind: str, affine: bool):
    """Fused forward step in transposed layout -> (zt_next, logdet (B,))."""
    weights = pack_weights(sp, kind, affine, reverse=False)
    zn, ld = _partitioned(False, affine, hw[0], hw[1], b)(zt, *weights)
    return zn, ld[:, 0]


def step_reverse_t(sp, zt: jax.Array, hw, b: int, kind: str, affine: bool):
    weights = pack_weights(sp, kind, affine, reverse=True)
    zn, _ = _partitioned(True, affine, hw[0], hw[1], b)(zt, *weights)
    return zn


def step_forward(sp, z: jax.Array, kind: str, affine: bool):
    """NHWC convenience wrapper -> (z_next, coupling logdet (B,))."""
    zt, ld = step_forward_t(sp, to_t(z), z.shape[1:3], z.shape[0], kind, affine)
    return from_t(zt, z.shape), ld


def step_reverse(sp, z: jax.Array, kind: str, affine: bool) -> jax.Array:
    zt = step_reverse_t(sp, to_t(z), z.shape[1:3], z.shape[0], kind, affine)
    return from_t(zt, z.shape)
