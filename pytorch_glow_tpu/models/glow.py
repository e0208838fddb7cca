"""The multi-scale Glow model: init / log_prob / sample as pure functions.

TPU-native redesign of the reference's FlowStep / FlowModel / Glow classes
(reference: upstream:network/model.py; SURVEY.md §2.1 #14-#17, §3.3).  Key
departures from the reference, by design:

* No `forward(reverse=bool)` dispatch — two pure entry points sharing params:
  `log_prob(params, x, ...)` and `sample(params, rng, ...)` (SURVEY.md §3.3).
* The K flow steps of each level run as ONE `lax.scan` over stacked step
  params: XLA compiles a single step body per level instead of K copies,
  and `jax.checkpoint` on the body gives O(sqrt)-style rematerialization for
  the paper-scale configs.
* ActNorm data-dependent init is `ddi_init`: one jitted pass over a host
  batch that threads activations depth-wise through the same scan and
  returns the fully-initialized param pytree (SURVEY.md §3.4) — no mutable
  module state, replica-consistent under pjit.
* Layout NHWC; squeeze/split are zero-copy reshapes (ops/reshape.py).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp

from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.models import layers as L
from pytorch_glow_tpu.ops.math import (
    bits_per_dim,
    discretization_correction,
    gaussian_logp,
    gaussian_sample,
    num_dims,
)
from pytorch_glow_tpu.ops.reshape import split_channel, squeeze2d, unsqueeze2d

Params = dict[str, Any]


# ---------------------------------------------------------------------------
# Init
# ---------------------------------------------------------------------------


def _flow_step_init(rng: jax.Array, c: int, cfg: GlowConfig) -> Params:
    r_perm, r_net = jax.random.split(rng)
    c_half = c // 2
    c_out = c_half if cfg.flow_coupling == "additive" else c
    return {
        "actnorm": L.actnorm_init(c),
        "perm": L.permutation_init(
            r_perm, c, cfg.flow_permutation, cfg.lu_decomposed
        ),
        "coupling": L.coupling_net_init(r_net, c_half, cfg.hidden_channels, c_out),
    }


def init_glow(rng: jax.Array, cfg: GlowConfig) -> Params:
    """Build the full parameter pytree.

    levels[i]["steps"] is a pytree whose leaves have a leading K axis —
    the stacked per-step params consumed by `lax.scan`.
    """
    levels = []
    shapes = cfg.latent_shapes()
    for i, (_, _, c) in enumerate(shapes):
        rng, *step_rngs = jax.random.split(rng, cfg.K + 1)
        steps = [_flow_step_init(r, c, cfg) for r in step_rngs]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *steps)
        split = L.split2d_init(c) if i < cfg.L - 1 else None
        levels.append({"steps": stacked, "split": split})

    _, _, c_final = shapes[-1]
    top: Params = {}
    if cfg.learn_top:
        top["learn_top"] = L.conv2d_zeros_init(2 * c_final, 2 * c_final, (3, 3))
    if cfg.y_condition:
        top["project_ycond"] = L.linear_zeros_init(cfg.y_classes, 2 * c_final)
        top["project_class"] = L.linear_zeros_init(c_final, cfg.y_classes)
    params: Params = {"levels": levels, "top": top}
    if cfg.dequant == "variational":
        from pytorch_glow_tpu.models import vardeq

        rng, r_vd = jax.random.split(rng)
        params["vardeq"] = vardeq.vardeq_init(r_vd, cfg)
    return params


# ---------------------------------------------------------------------------
# Flow step bodies (shared by encode / decode / ddi)
# ---------------------------------------------------------------------------


def _step_forward(sp: Params, z: jax.Array, logdet: jax.Array, cfg: GlowConfig, ddi: bool):
    """actnorm -> permutation -> coupling (reference FlowStep.normal_flow)."""
    dtype = jnp.dtype(cfg.compute_dtype)
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    z, logdet, an_new = L.actnorm_forward(
        sp["actnorm"], z, logdet, ddi=ddi, scale=cfg.actnorm_scale
    )
    z, logdet = L.permutation_forward(
        sp["perm"], z, logdet, kind, cfg.invconv_impl, cfg.invconv_precision
    )
    z, logdet, cp_new = L.coupling_forward(
        sp["coupling"], z, logdet, cfg.flow_coupling, ddi=ddi, compute_dtype=dtype
    )
    new_sp = {"actnorm": an_new, "perm": sp["perm"], "coupling": cp_new} if ddi else None
    return z, logdet, new_sp


def _step_reverse(sp: Params, z: jax.Array, cfg: GlowConfig) -> jax.Array:
    """coupling^-1 -> permutation^-1 -> actnorm^-1."""
    dtype = jnp.dtype(cfg.compute_dtype)
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    z = L.coupling_reverse(sp["coupling"], z, cfg.flow_coupling, compute_dtype=dtype)
    z = L.permutation_reverse(
        sp["perm"], z, kind, cfg.invconv_impl, cfg.invconv_precision
    )
    z = L.actnorm_reverse(sp["actnorm"], z)
    return z


# -- fused whole-step Pallas path (cfg.flowstep_impl == "pallas") -----------
# Forward/reverse run the ops/flowstep_pallas.py kernel.  The forward's
# custom_vjp backward runs the FUSED BACKWARD kernel (recompute-in-VMEM,
# exact vs f32 autodiff) when the shape tiles into its VMEM budget, else
# jax.vjp over the identical XLA layer math below — so training is fully
# fused in both directions on the flagship shapes.


def _fused_ref_forward(sp, z, kind: str, mode: str):
    """XLA re-statement of the kernel's exact math (bf16 coupling) — the
    custom_vjp backward differentiates this."""
    z, _, _ = L.actnorm_forward(sp["actnorm"], z, None)
    z, _ = L.permutation_forward(sp["perm"], z, None, kind, "xla", "highest")
    z, ld, _ = L.coupling_forward(
        sp["coupling"], z, jnp.zeros((z.shape[0],), jnp.float32), mode,
        compute_dtype=jnp.bfloat16,
    )
    return z, ld


def _fused_ref_reverse(sp, z, kind: str, mode: str):
    z = L.coupling_reverse(sp["coupling"], z, mode, compute_dtype=jnp.bfloat16)
    z = L.permutation_reverse(sp["perm"], z, kind, "xla", "highest")
    return L.actnorm_reverse(sp["actnorm"], z)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_step_forward(sp, zt, kind: str, mode: str, hw: tuple, b: int):
    from pytorch_glow_tpu.ops import flowstep_pallas as fsp

    return fsp.step_forward_t(sp, zt, hw, b, kind, mode == "affine")


def _fused_ref_forward_t(sp, zt, kind, mode, hw, b):
    from pytorch_glow_tpu.ops import flowstep_pallas as fsp

    z = fsp.from_t(zt, (b, hw[0], hw[1], zt.shape[0]))
    zn, ld = _fused_ref_forward(sp, z, kind, mode)
    return fsp.to_t(zn), ld


def _fused_fwd_rule(sp, zt, kind, mode, hw, b):
    return _fused_step_forward(sp, zt, kind, mode, hw, b), (sp, zt)


def _fused_bwd_rule(kind, mode, hw, b, res, g):
    sp, zt = res
    from pytorch_glow_tpu.ops import flowstep_pallas as fsp

    hidden = sp["coupling"]["conv1"]["w"].shape[-1]
    if fsp.backward_supported(
        hw[0], hw[1], zt.shape[0], hidden, b, mode == "affine"
    ):
        # Fused backward kernel: recomputes the forward in VMEM and emits
        # cotangents for (packed weights, zt) in one pass; packed-weight
        # grads map back to the param pytree through the vjp of the packing
        # itself (LU assembly, transposes, casts — all XLA).
        affine = mode == "affine"
        g_zn, g_ld = g
        packed, pack_vjp = jax.vjp(
            lambda s: tuple(fsp.pack_weights(s, kind, affine, False)), sp
        )
        g_packed, g_zt = fsp.step_backward_t(
            packed, zt, g_zn, g_ld, hw, b, affine
        )
        (g_sp,) = pack_vjp(g_packed)
        return g_sp, g_zt
    _, vjp = jax.vjp(
        lambda s, x: _fused_ref_forward_t(s, x, kind, mode, hw, b), sp, zt
    )
    return vjp(g)


_fused_step_forward.defvjp(_fused_fwd_rule, _fused_bwd_rule)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _fused_step_reverse(sp, zt, kind: str, mode: str, hw: tuple, b: int):
    from pytorch_glow_tpu.ops import flowstep_pallas as fsp

    return fsp.step_reverse_t(sp, zt, hw, b, kind, mode == "affine")


def _fused_rev_fwd_rule(sp, zt, kind, mode, hw, b):
    return _fused_step_reverse(sp, zt, kind, mode, hw, b), (sp, zt)


def _fused_rev_bwd_rule(kind, mode, hw, b, res, g):
    sp, zt = res

    def ref(s, x):
        from pytorch_glow_tpu.ops import flowstep_pallas as fsp

        z = fsp.from_t(x, (b, hw[0], hw[1], x.shape[0]))
        return fsp.to_t(_fused_ref_reverse(s, z, kind, mode))

    _, vjp = jax.vjp(ref, sp, zt)
    return vjp(g)


_fused_step_reverse.defvjp(_fused_rev_fwd_rule, _fused_rev_bwd_rule)


def _use_fused(cfg: GlowConfig, z) -> bool:
    if cfg.flowstep_impl != "pallas":
        return False
    from pytorch_glow_tpu.ops import flowstep_pallas as fsp

    return fsp.supported(
        z.shape[1], z.shape[2], z.shape[3], cfg.hidden_channels,
        cfg.flow_coupling == "affine", b=z.shape[0],
    )


def _scan_steps_forward(steps: Params, z, logdet, cfg: GlowConfig, ddi: bool):
    kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    if not ddi and _use_fused(cfg, z):
        from pytorch_glow_tpu.ops import flowstep_pallas as fsp

        b, hh, ww, _ = z.shape
        pixels = hh * ww
        zt = fsp.to_t(z)  # transposed carry: one layout change per level

        def body(carry, sp):
            zt, ld = carry
            ztn, ld_c = _fused_step_forward(
                sp, zt, kind, cfg.flow_coupling, (hh, ww), b
            )
            return (ztn, ld + ld_c), None

        if cfg.remat:
            body = jax.checkpoint(body)
        (zt, logdet), _ = jax.lax.scan(
            body, (zt, logdet), steps, unroll=cfg.scan_unroll
        )
        # The z-independent logdet terms (actnorm + permutation), batched
        # over K in one shot instead of inside the kernel.
        plds = jax.vmap(lambda sp: fsp.param_logdet(sp, kind))(steps)
        return fsp.from_t(zt, z.shape), logdet + pixels * jnp.sum(plds), None

    def body(carry, sp):
        z, logdet = carry
        z, logdet, new_sp = _step_forward(sp, z, logdet, cfg, ddi)
        return (z, logdet), new_sp

    if cfg.remat and not ddi:
        body = jax.checkpoint(body)
    (z, logdet), new_steps = jax.lax.scan(
        body, (z, logdet), steps, unroll=cfg.scan_unroll
    )
    return z, logdet, new_steps


def _scan_steps_reverse(steps: Params, z, cfg: GlowConfig):
    if _use_fused(cfg, z):
        from pytorch_glow_tpu.ops import flowstep_pallas as fsp

        kind = L.permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
        b, hh, ww, _ = z.shape
        zt = fsp.to_t(z)

        def body(zt, sp):
            return _fused_step_reverse(
                sp, zt, kind, cfg.flow_coupling, (hh, ww), b
            ), None

        if cfg.remat:
            body = jax.checkpoint(body)
        zt, _ = jax.lax.scan(body, zt, steps, reverse=True, unroll=cfg.scan_unroll)
        return fsp.from_t(zt, z.shape)

    def body(z, sp):
        return _step_reverse(sp, z, cfg), None

    if cfg.remat:
        body = jax.checkpoint(body)
    z, _ = jax.lax.scan(body, z, steps, reverse=True, unroll=cfg.scan_unroll)
    return z


def _maybe_shard_spatial(z: jax.Array, cfg: GlowConfig) -> jax.Array:
    """Opt-in spatial parallelism: constrain (B, H, W, C) to shard H over
    the mesh "model" axis (batch stays on "data").  No-op without an
    ambient mesh (jax.set_mesh) or when H does not divide the axis.
    GSPMD inserts the 3x3-conv halo exchanges automatically."""
    if not cfg.shard_spatial:
        return z
    from jax.sharding import PartitionSpec

    from pytorch_glow_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

    mesh = jax.sharding.get_abstract_mesh()
    if mesh is None or getattr(mesh, "empty", True) or MODEL_AXIS not in mesh.shape:
        return z
    if z.shape[1] % mesh.shape[MODEL_AXIS] != 0:
        return z
    return jax.lax.with_sharding_constraint(
        z, PartitionSpec(DATA_AXIS, MODEL_AXIS, None, None)
    )


# ---------------------------------------------------------------------------
# Encode / decode through the multi-scale stack
# ---------------------------------------------------------------------------


def encode(
    params: Params,
    x: jax.Array,
    cfg: GlowConfig,
    logdet: jax.Array | None = None,
    ddi: bool = False,
):
    """x -> (z_final, logdet, z_splits, new_level_params_or_None).

    Per level: squeeze -> K steps (scan) -> split (all but last level)
    (reference: upstream:network/model.py `FlowModel.encode`).
    """
    if logdet is None:
        logdet = jnp.zeros((x.shape[0],), jnp.float32)
    z = x
    z_splits: list[jax.Array] = []
    new_levels = [] if ddi else None
    for i, level in enumerate(params["levels"]):
        z = squeeze2d(z, 2)
        z = _maybe_shard_spatial(z, cfg)
        z, logdet, new_steps = _scan_steps_forward(level["steps"], z, logdet, cfg, ddi)
        if level["split"] is not None:
            z, logdet, z2 = L.split2d_forward(level["split"], z, logdet)
            z_splits.append(z2)
        if ddi:
            new_levels.append({"steps": new_steps, "split": level["split"]})
    return z, logdet, z_splits, new_levels


def decode(
    params: Params,
    z: jax.Array,
    cfg: GlowConfig,
    rng: jax.Array | None = None,
    temperature: float | jax.Array = 1.0,
    z_splits: list[jax.Array] | None = None,
) -> jax.Array:
    """z -> x.  If `z_splits` is given the reconstruction is exact; otherwise
    each Split2d re-samples its half from the learned prior at `temperature`
    (reference: `FlowModel.decode` with eps_std)."""
    n_splits = cfg.L - 1
    if z_splits is None and n_splits > 0:
        assert rng is not None, "need rng to sample split halves"
        split_rngs = list(jax.random.split(rng, n_splits))
    for i in range(cfg.L - 1, -1, -1):
        level = params["levels"][i]
        if level["split"] is not None:
            if z_splits is not None:
                z = L.split2d_reverse(level["split"], z, None, z2=z_splits[i])
            else:
                z = L.split2d_reverse(
                    level["split"], z, split_rngs[i], temperature=temperature
                )
        z = _maybe_shard_spatial(z, cfg)
        z = _scan_steps_reverse(level["steps"], z, cfg)
        z = unsqueeze2d(z, 2)
    return z


# ---------------------------------------------------------------------------
# Top prior (learn_top / y-conditional)
# ---------------------------------------------------------------------------


def top_prior(
    params: Params,
    cfg: GlowConfig,
    batch: int,
    y_onehot: jax.Array | None = None,
) -> tuple[jax.Array, jax.Array]:
    """(mean, logs) of the final-latent prior, shape (B, 1, 1, C_final).

    The reference convolves a zeros tensor of full spatial extent; a zeros
    input makes the conv output spatially constant (= scaled bias), so we
    keep (1, 1) spatial and let broadcasting do the rest — bit-identical,
    but no wasted HBM traffic (reference: upstream:network/model.py
    `Glow.prior`).
    """
    c = cfg.final_latent_shape[-1]
    h = jnp.zeros((batch, 1, 1, 2 * c), jnp.float32)
    if cfg.learn_top:
        h = L.conv2d_zeros_forward(params["top"]["learn_top"], h)
    if cfg.y_condition:
        assert y_onehot is not None, "y_condition model needs y_onehot"
        yp = L.linear_zeros_forward(
            params["top"]["project_ycond"], y_onehot.astype(jnp.float32)
        )
        h = h + yp[:, None, None, :]
    return split_channel(h, "simple")  # reference uses "split" (simple) here


# ---------------------------------------------------------------------------
# Public API: log_prob / sample / ddi_init / loss
# ---------------------------------------------------------------------------


def preprocess(x_uint8: jax.Array, cfg: GlowConfig) -> jax.Array:
    """uint8 [0,255] -> n_bits-reduced float in [0,1)."""
    x = x_uint8.astype(jnp.float32)
    if cfg.n_bits_x < 8:
        x = jnp.floor(x / 2 ** (8 - cfg.n_bits_x))
        return x / cfg.n_bins
    return x / 256.0


def postprocess(x: jax.Array, cfg: GlowConfig) -> jax.Array:
    """float [0,1) -> uint8 image."""
    x = jnp.clip(jnp.floor(x * cfg.n_bins) * (256.0 / cfg.n_bins), 0, 255)
    return x.astype(jnp.uint8)


def dequantize(rng: jax.Array, x: jax.Array, cfg: GlowConfig) -> jax.Array:
    """Training-time dequantization noise on [0,1)-scaled inputs.

    Default uniform U(0, 1/n_bins) (paper-correct); "gaussian" reproduces the
    reference lineage's N(0, (1/n_bins)^2) quirk for parity experiments.
    For dequant="variational" this PARAM-FREE helper adds plain uniform
    noise — it serves input prep (DDI batches, benchmarks); the learned
    q(u|x) path lives in `log_prob` (models/vardeq.py)."""
    if cfg.dequant in ("uniform", "variational"):
        return x + jax.random.uniform(rng, x.shape, x.dtype) / cfg.n_bins
    if cfg.dequant == "gaussian":
        return x + jax.random.normal(rng, x.shape, x.dtype) / cfg.n_bins
    return x


def log_prob(
    params: Params,
    x: jax.Array,
    cfg: GlowConfig,
    rng: jax.Array | None = None,
    y_onehot: jax.Array | None = None,
) -> dict[str, jax.Array]:
    """Forward density: x in [0,1) -> {z, objective, nll (bits/dim), y_logits}.

    objective = -D*log(n_bins) + logdet + sum_splits logp(z_i) + logp_top(z_L)
    nll = -objective / (ln2 * D), D = C*H*W (SURVEY.md §2.4).
    """
    dims = num_dims((x.shape[0], *cfg.image_shape))
    neg_log_q = None
    if rng is not None:
        if cfg.dequant == "variational":
            # Learned q(u|x): −log q tightens the bound (exactly 0 for
            # uniform q and at the flow's zero-init; models/vardeq.py).
            from pytorch_glow_tpu.models import vardeq

            x, neg_log_q = vardeq.vardeq_apply(params["vardeq"], rng, x, cfg)
        else:
            x = dequantize(rng, x, cfg)
    logdet = jnp.full((x.shape[0],), discretization_correction(dims, cfg.n_bins), jnp.float32)
    if neg_log_q is not None:
        logdet = logdet + neg_log_q
    z, objective, _, _ = encode(params, x, cfg, logdet=logdet)
    mean, logs = top_prior(params, cfg, x.shape[0], y_onehot)
    objective = objective + gaussian_logp(mean, logs, z.astype(jnp.float32))
    out = {
        "z": z,
        "objective": objective,
        "nll": bits_per_dim(objective, dims),
    }
    if neg_log_q is not None:
        out["neg_log_q"] = neg_log_q
    if cfg.y_condition:
        pooled = jnp.mean(z.astype(jnp.float32), axis=(1, 2))
        out["y_logits"] = L.linear_zeros_forward(params["top"]["project_class"], pooled)
    return out


def nll_bound(
    params: Params,
    x: jax.Array,
    cfg: GlowConfig,
    rng: jax.Array,
    samples: int = 1,
    bound: str = "elbo",
    y_onehot: jax.Array | None = None,
) -> jax.Array:
    """Monte-Carlo DISCRETE-NLL bound in bits/dim, shape (B,).

    `log_prob(rng=None)` (the reference lineage's eval convention) evaluates
    the continuous density at the bin corner — fine for relative model
    selection, but NOT a valid bound on the discrete likelihood P(x).  This
    is the valid one, matching what flow papers report:

      bound="elbo": mean over k noise draws of the per-draw dequantization
                    bound (k=1 = the standard published protocol)
      bound="iwae": logsumexp importance bound (Burda et al. 2016,
                    arXiv:1509.00519) — tighter, approaches log P(x) as
                    k grows; weights are p(x+u_i)·n_bins^{-D}/q(u_i), which
                    is exactly `objective` for both uniform and variational
                    q (the −log q term is already folded in).

    Noise draws run under `lax.map` (sequential, one compiled body) so k
    scales without k× activation memory.
    """
    assert bound in ("elbo", "iwae"), bound
    if cfg.dequant not in ("uniform", "variational"):
        # gaussian/none noise has no (or unbounded-support) q-density folded
        # into the objective — the result would NOT bound the discrete NLL.
        raise ValueError(
            f"nll_bound is only a valid discrete-NLL bound for "
            f"dequant='uniform'/'variational', not {cfg.dequant!r}"
        )

    def one(r):
        return log_prob(params, x, cfg, rng=r, y_onehot=y_onehot)["objective"]

    objs = jax.lax.map(one, jax.random.split(rng, samples))  # (k, B)
    if bound == "iwae":
        obj = jax.scipy.special.logsumexp(objs, axis=0) - jnp.log(float(samples))
    else:
        obj = jnp.mean(objs, axis=0)
    dims = num_dims((x.shape[0], *cfg.image_shape))
    return bits_per_dim(obj, dims)


def sample(
    params: Params,
    rng: jax.Array,
    cfg: GlowConfig,
    n: int,
    temperature: float | jax.Array = 1.0,
    y_onehot: jax.Array | None = None,
) -> jax.Array:
    """Temperature sampling: z_L ~ prior -> decode (re-sampling each split).

    Returns float images in [0,1) (apply `postprocess` for uint8).
    """
    rng_top, rng_dec = jax.random.split(rng)
    mean, logs = top_prior(params, cfg, n, y_onehot)
    hf, wf, cf = cfg.final_latent_shape
    z = gaussian_sample(rng_top, mean, logs, temperature, shape=(n, hf, wf, cf))
    return decode(params, z, cfg, rng=rng_dec, temperature=temperature)


def reconstruct(params: Params, x: jax.Array, cfg: GlowConfig) -> jax.Array:
    """decode(encode(x)) with stored split halves — the exact round-trip."""
    z, _, z_splits, _ = encode(params, x, cfg)
    return decode(params, z, cfg, z_splits=z_splits)


@functools.partial(jax.jit, static_argnames=("cfg",))
def ddi_init(params: Params, x: jax.Array, cfg: GlowConfig) -> Params:
    """Data-dependent actnorm init: ONE jitted depth-scan over a host batch.

    Replaces the reference's first-forward mutable-state trick (SURVEY.md
    §3.4).  `x` must already be preprocessed+dequantized.  Under pjit the
    batch statistics reduce globally, so all replicas get identical params.
    """
    _, _, _, new_levels = encode(params, x, cfg, ddi=True)
    # Preserve non-level param groups (top, vardeq, ...) — DDI only
    # re-derives the actnorm statistics inside the levels.
    return {**params, "levels": new_levels}


def loss_fn(
    params: Params,
    x: jax.Array,
    cfg: GlowConfig,
    rng: jax.Array | None = None,
    y_onehot: jax.Array | None = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Total loss = mean(nll) [+ weight_y * classification] (reference
    `Glow.loss_generative` / `loss_multi_classes` / `loss_class`)."""
    out = log_prob(params, x, cfg, rng=rng, y_onehot=y_onehot)
    loss_gen = jnp.mean(out["nll"])
    metrics = {"nll": loss_gen}
    loss = loss_gen
    if "neg_log_q" in out:
        # bits/dim the learned q(u|x) charges for its noise (0 at init /
        # under uniform q; the bound improves when the p-term gains more
        # than this costs).
        dims = num_dims((x.shape[0], *cfg.image_shape))
        metrics["vardeq_logq_bits"] = -jnp.mean(out["neg_log_q"]) / (
            jnp.log(2.0) * dims
        )
    if cfg.y_condition:
        logits = out["y_logits"]
        if cfg.y_multi_class:
            # BCE-with-logits over 40 binary attributes (CelebA).
            labels = (y_onehot > 0).astype(jnp.float32)
            cls = jnp.mean(
                jnp.maximum(logits, 0) - logits * labels + jnp.log1p(jnp.exp(-jnp.abs(logits)))
            )
        else:
            logp = jax.nn.log_softmax(logits)
            cls = -jnp.mean(jnp.sum(logp * y_onehot, axis=-1))
        metrics["loss_class"] = cls
        loss = loss + cfg.weight_y * cls
    metrics["loss"] = loss
    return loss, metrics
