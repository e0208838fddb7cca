"""Property sweep over the fused-kernel tile choosers (pure Python, no
kernels executed).

Every round-2 advisor item and both real-TPU Mosaic OOMs this project hit
were tile-selection bugs at UNTESTED shapes — the byte/column models and
feasibility predicates in ops/flowstep_pallas.py are the only thing standing
between the dispatcher and a hardware VMEM overflow.  This sweep asserts
their invariants over a broad (h, w, c, hidden, b, affine) grid:

  * whole-image tiles: divisor of b, lane-aligned (128 columns) or a single
    full tile, and ALWAYS within the budget's column cap;
  * halo row bands: R | H, R >= 4, lane-aligned center band, extended
    (R+4)-row region within the (derated) halo budget;
  * infeasible configs (e.g. the deep 256²-config backward levels whose
    resident weights alone exceed VMEM) report unsupported instead of
    choosing an overflowing tile;
  * the production preset levels stay on their documented paths.
"""

import itertools

from pytorch_glow_tpu.ops import flowstep_pallas as fsp


HS = [4, 5, 6, 8, 12, 16, 32, 64, 128, 256]
CS = [6, 12, 24, 48, 96, 192, 384, 768]
BS = [1, 8, 64, 512]
HIDDENS = [128, 512]


def _grid():
    for h, c, hidden, affine, b in itertools.product(
        HS, CS, HIDDENS, (True, False), BS
    ):
        yield h, h, c, hidden, affine, b  # square
    # A few non-square / odd-aspect shapes (the halo chooser tiles rows).
    for (h, w), c, hidden, affine, b in itertools.product(
        [(8, 32), (32, 8), (5, 7), (96, 160), (160, 96), (12, 384)],
        [12, 48, 192], HIDDENS, (True, False), [8, 64]
    ):
        yield h, w, c, hidden, affine, b


def test_forward_tile_invariants():
    for h, w, c, hidden, affine, b in _grid():
        if c % 2:
            continue
        hw = h * w
        cap = fsp._max_cols(c, hidden, affine)
        if fsp._whole_image_ok(h, w, c, hidden, b, affine):
            tb = fsp._tile_batch(b, h, w, c, hidden, affine)
            assert b % tb == 0
            assert tb * hw <= cap, (h, w, c, hidden, affine, b, tb, cap)
            assert (tb * hw) % 128 == 0 or tb == b
        elif fsp.supported(h, w, c, hidden, affine, b=b):
            # Routed to halo row bands: re-assert the chooser's contract.
            r = fsp._halo_rows(h, w, c, hidden, affine)
            assert r is not None and r >= 4 and h % r == 0
            assert (r * w) % 128 == 0
            halo_bytes = fsp._bytes_per_col(c, hidden, affine) + 5 * c * 4
            assert (r + 4) * w * halo_bytes <= fsp.VMEM_BUDGET


def test_backward_tile_invariants():
    for h, w, c, hidden, affine, b in _grid():
        if c % 2:
            continue
        hw = h * w
        cap = fsp._bwd_max_cols(c, hidden, affine)
        if fsp._bwd_whole_image_ok(h, w, c, hidden, b, affine):
            tb = fsp._bwd_tile_batch(b, h, w, c, hidden, affine)
            assert b % tb == 0
            assert tb * hw <= cap, (h, w, c, hidden, affine, b, tb, cap)
            assert (tb * hw) % 128 == 0 or tb == b
        elif fsp.backward_supported(h, w, c, hidden, b, affine):
            r = fsp._bwd_halo_rows(h, w, c, hidden, affine)
            assert r is not None and r >= 4 and h % r == 0
            assert (r * w) % 128 == 0
            budget = fsp._BWD_HALO_VMEM - fsp._bwd_fixed_bytes(c, hidden, affine)
            per_col = fsp._bwd_halo_bytes_per_col(c, hidden, affine)
            assert (r + 4) * w * per_col <= budget


def test_resident_weight_overflow_reports_unsupported():
    # c=768/hidden=512 resident weights + f32 grad accumulators alone blow
    # the 16 MB scoped VMEM: the model must say "no" rather than pick a tile
    # (the real-TPU Mosaic stack OOM class from round 3).
    for affine in (True, False):
        if fsp._bwd_fixed_bytes(768, 512, affine) >= fsp._BWD_TOTAL_VMEM:
            assert not fsp.backward_supported(2, 2, 768, 512, 8, affine)
            assert fsp._bwd_max_cols(768, 512, affine) == 0


def _levels(size, l_levels, c_in=3):
    """Per-level flow-step shapes: squeeze doubles channels-per-pixel-quad
    each level (c0 = 4*c_in, c_{i+1} = 2*c_i; spatial halves)."""
    return [
        (size // 2 ** (i + 1), size // 2 ** (i + 1), 4 * c_in * 2**i)
        for i in range(l_levels)
    ]


def test_production_preset_levels_feasible():
    # cifar10 / celeba64 / imagenet64-cond flagship levels (affine, hidden
    # 512) must ALL run fused fwd+bwd at their preset batch sizes — the
    # "level-0 tile MUST fit" contract from the backward budget comment.
    for size, L_, b in [(32, 3, 256), (64, 4, 128), (64, 4, 128)]:
        for h, w, c in _levels(size, L_):
            assert fsp.supported(h, w, c, 512, True, b=b), (size, h, w, c)
            assert fsp.backward_supported(h, w, c, 512, b, True), (size, h, w, c)


def test_celebahq256_levels_documented_paths():
    # celebahq256 (additive, hidden 512, b8): every level fused in forward;
    # backward fused everywhere EXCEPT the 4²·c384 deep level, which falls
    # back to the XLA vjp (negligible FLOP share — ROUND3.md).  If the budget
    # model ever improves enough to fuse it, update this lock.
    levels = _levels(256, 6)
    for h, w, c in levels:
        assert fsp.supported(h, w, c, 512, False, b=8), (h, w, c)
    for h, w, c in levels[:-1]:
        assert fsp.backward_supported(h, w, c, 512, 8, False), (h, w, c)
    h, w, c = levels[-1]
    assert (h, w, c) == (4, 4, 384)
    assert not fsp.backward_supported(h, w, c, 512, 8, False)
