"""Pallas TPU kernel: LU-parameterized invertible 1x1 conv, fused.

North-star requirement (BASELINE.json): fuse the LU weight reconstruction
W = P @ L @ (U + diag(sign_s * e^{log_s})) with the (B*H*W, C) x (C, C)
channel-mixing matmul and the sum(log_s) logdet term into one kernel.

Kernel strategy (see /opt/skills/guides/pallas_guide.md):
* Grid over row-tiles of the flattened pixel batch (TILE_N x C blocks in
  VMEM); C stays whole (<= a few hundred channels for all Glow configs).
* Grid steps execute sequentially on a TPU core and VMEM scratch persists
  across them, so W is reconstructed ONCE in step 0 into scratch — tril/triu
  masks from broadcasted_iota, the small L @ U' matmul, and the P row
  permutation as a dense P-matrix matmul (MXU-friendly; no in-kernel
  gather) — then every tile reuses it.
* The per-pixel logdet (sum log_s) is emitted once into SMEM; the caller
  scales by H*W.
* All matmuls run f32 with preferred_element_type=f32 (parity with the
  XLA path's HIGHEST precision; the logdet feeds the NLL).

The reverse direction reconstructs W^{-1} via two CxC triangular solves in
XLA (cheap, done once) and reuses the same tiled-matmul kernel for the
pixel batch.  Gradients route through jax.custom_vjp to the XLA reference
implementation (ops/invconv_xla.py) — identical math, so the kernel is a
pure forward-speed play and falls back bit-compatibly.

On non-TPU backends the kernel runs in interpret mode (tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.custom_partitioning import custom_partitioning
from jax.sharding import NamedSharding, PartitionSpec as P

from pytorch_glow_tpu.ops import invconv_xla as ic

TILE_N = 1024


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


# ---------------------------------------------------------------------------
# Fused forward kernel: W <- P L U' (once), y_tile = x_tile @ W^T, logdet
# ---------------------------------------------------------------------------


def _fwd_kernel(l_ref, u_ref, s_ref, sign_ref, pmat_ref, x_ref, y_ref, ld_ref, w_scratch):
    c = l_ref.shape[0]

    @pl.when(pl.program_id(0) == 0)
    def _build_w():
        row = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
        eye = (row == col).astype(jnp.float32)
        l = jnp.where(row > col, l_ref[:], 0.0) + eye
        s = sign_ref[0, :] * jnp.exp(s_ref[0, :])
        u = jnp.where(row < col, u_ref[:], 0.0) + eye * s[None, :]
        lu = jnp.dot(l, u, preferred_element_type=jnp.float32,
                     precision=jax.lax.Precision.HIGHEST)
        # Row permutation as a dense matmul: W = P @ (L @ U').
        w_scratch[:] = jnp.dot(pmat_ref[:], lu, preferred_element_type=jnp.float32,
                               precision=jax.lax.Precision.HIGHEST)
        ld_ref[0, 0] = jnp.sum(s_ref[0, :])

    # y = x @ W^T for this row-tile.
    y_ref[:] = jax.lax.dot_general(
        x_ref[:],
        w_scratch[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pallas_fused_raw(
    x2d: jax.Array,
    l_raw: jax.Array,
    u_raw: jax.Array,
    log_s: jax.Array,
    sign_s: jax.Array,
    pmat: jax.Array,
) -> jax.Array:
    """Shard-local fused call: (N, C) f32 -> y (N, C)."""
    n, c = x2d.shape
    grid = (pl.cdiv(n, TILE_N),)
    y, _ = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((c, c), jnp.float32)],
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * c + 2 * c * c * c,
            bytes_accessed=4 * (2 * n * c + 4 * c * c),
            transcendentals=c,
        ),
    )(l_raw, u_raw, log_s[None, :], sign_s[None, :], pmat, x2d)
    return y


# GSPMD integration: the kernel is row-parallel (each pixel row is mixed
# independently, the LU factors are replicated), so under a mesh we tell the
# partitioner exactly that via custom_partitioning — the per-shard lowering
# is the same pallas_call on the local rows, and NO collectives are needed.
_mix_fused = custom_partitioning(_pallas_fused_raw)


def _row_sharding(mesh, arg_shapes):
    spec = arg_shapes[0].sharding.spec
    row = spec[0] if len(spec) > 0 else None
    return NamedSharding(mesh, P(row, None))


def _fused_infer(mesh, arg_shapes, result_shape):
    return _row_sharding(mesh, arg_shapes)


def _fused_partition(mesh, arg_shapes, result_shape):
    out_sh = _row_sharding(mesh, arg_shapes)
    rep = NamedSharding(mesh, P())
    arg_sh = (out_sh,) + (rep,) * 5
    return mesh, _pallas_fused_raw, out_sh, arg_sh


_mix_fused.def_partition(
    partition=_fused_partition,
    infer_sharding_from_operands=_fused_infer,
    # shardy rule: rows of x and y share a factor; weights use private ones.
    sharding_rule="n c, i j, k l, m, o, p q -> n c",
)


# ---------------------------------------------------------------------------
# Plain tiled matmul kernel (reverse path: W^-1 precomputed in XLA)
# ---------------------------------------------------------------------------


def _matmul_kernel(w_ref, x_ref, y_ref):
    y_ref[:] = jax.lax.dot_general(
        x_ref[:],
        w_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


def _pallas_plain_raw(x2d: jax.Array, w: jax.Array) -> jax.Array:
    """(N, C) @ W^T via the same tiling (used for the inverse direction)."""
    n, c = x2d.shape
    grid = (pl.cdiv(n, TILE_N),)
    return pl.pallas_call(
        _matmul_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((c, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_N, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((TILE_N, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, c), jnp.float32),
        interpret=_interpret(),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * c * c, bytes_accessed=4 * (2 * n * c + c * c), transcendentals=0
        ),
    )(w, x2d)


_mix_plain = custom_partitioning(_pallas_plain_raw)


def _plain_partition(mesh, arg_shapes, result_shape):
    out_sh = _row_sharding(mesh, arg_shapes)
    rep = NamedSharding(mesh, P())
    return mesh, _pallas_plain_raw, out_sh, (out_sh, rep)


_mix_plain.def_partition(
    partition=_plain_partition,
    infer_sharding_from_operands=_fused_infer,
    sharding_rule="n c, p q -> n c",
)


# ---------------------------------------------------------------------------
# Public entry points (shape-polymorphic over (..., C); custom VJP to XLA)
# ---------------------------------------------------------------------------


import functools


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def invconv_lu_forward(
    x: jax.Array, lu: ic.LUParams, bwd_precision: str = "highest"
) -> tuple[jax.Array, jax.Array]:
    """y[..., :] = W @ x[..., :]; returns (y, per-pixel logdet scalar).

    The kernel forward is ALWAYS exact f32 (round-trip + NLL depend on it);
    `bwd_precision` selects the MXU pass count of the gradient matmuls only
    (gradients tolerate 3-pass "high" with ~1e-6 relative error — lets
    training presets run the kernel without paying 6-pass backward cost).
    """
    shape = x.shape
    c = shape[-1]
    x2d = x.astype(jnp.float32).reshape(-1, c)
    pmat = jax.nn.one_hot(lu.p_idx, c, dtype=jnp.float32)  # W = P @ LU'
    y = _mix_fused(x2d, lu.l_raw, lu.u_raw, lu.log_s, lu.sign_s, pmat)
    return y.reshape(shape).astype(x.dtype), ic.lu_logdet(lu)


def _xla_fwd(x, lu, precision: str):
    w = ic.lu_assemble(lu)
    y = ic.mix_channels(x, w, ic.PRECISIONS[precision]).astype(x.dtype)
    return y, ic.lu_logdet(lu)


def _fwd_rule(x, lu, bwd_precision):
    out = invconv_lu_forward(x, lu, bwd_precision)
    return out, (x, lu)


def _bwd_rule(bwd_precision, res, g):
    x, lu = res
    # Differentiate the mathematically-identical XLA path.
    _, vjp = jax.vjp(lambda x, lu: _xla_fwd(x, lu, bwd_precision), x, lu)
    return vjp(g)


invconv_lu_forward.defvjp(_fwd_rule, _bwd_rule)


def invconv_lu_reverse(y: jax.Array, lu: ic.LUParams) -> jax.Array:
    """x = W^{-1} y: CxC inverse via XLA triangular solves (once), pixel
    matmul via the Pallas tile kernel."""
    w_inv = ic.lu_inverse(lu)
    shape = y.shape
    y2d = y.astype(jnp.float32).reshape(-1, shape[-1])
    x = _mix_plain(y2d, w_inv)
    return x.reshape(shape).astype(y.dtype)
