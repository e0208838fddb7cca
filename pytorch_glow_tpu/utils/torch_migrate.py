"""Bidirectional migration: reference-lineage PyTorch snapshots <-> our pytree.

The reference (upstream:corenel/pytorch-glow; SURVEY.md §2.1 #6/#18) persists
``state_dict`` snapshots of its ``Glow`` nn.Module.  A user switching to this
framework brings such a snapshot; a user cross-checking against the lineage
wants to go the other way.  This module converts between that naming/layout
and our functional param pytree (models/glow.py ``init_glow``):

  torch (lineage)                         ours
  ---------------                         ----
  flow.layers.{j}.actnorm.bias (1,C,1,1)  levels[i].steps.actnorm.bias (K,C)
  flow.layers.{j}.invconv.{p,sign_s,      levels[i].steps.perm.lu
      lower,log_s,upper}                      (LUParams: p_idx,l_raw,u_raw,...)
  flow.layers.{j}.invconv.weight (C,C)    levels[i].steps.perm.w
  flow.layers.{j}.{shuffle|reverse}.      levels[i].steps.perm.{idx,inv_idx}
      indices / indices_inverse
  flow.layers.{j}.f.{0,2}.weight +        levels[i].steps.coupling.conv{1,2}
      f.{0,2}.actnorm.{bias,logs}             .{w, actnorm}
  flow.layers.{j}.f.4.{weight,bias,logs}  levels[i].steps.coupling.conv3
  flow.layers.{j}.conv.{weight,bias,logs} levels[i].split.prior_conv
  learn_top.{weight,bias,logs}            top.learn_top
  project_ycond / project_class           top.project_ycond / top.project_class

Torch layer indices {j} count Squeeze layers (paramless, absent from the
state_dict); import therefore matches param-bearing key groups in index order
against the L*K + (L-1) slots the config implies, and verifies each group's
content against the expected layer type.

Layout conversions: conv weights (out,in,kh,kw) <-> (kh,kw,in,out); per-channel
vectors reshaped from the lineage's (1,C,1,1)/(C,1,1) broadcast shapes; linear
weights (out,in) <-> (in,out); the LU permutation between a one-hot matrix P
and our row-gather index (W = (L@U')[p_idx], invconv_xla.LUParams).

Exact key strings are recalled from the lineage at [M] confidence (SURVEY.md
§0 — the reference mount is empty); ``import_state_dict(rename=...)`` applies
prefix rewrites for forks that deviate.  ``dequant="variational"`` has no
reference counterpart: export covers the Glow core only, and import seeds a
fresh zero-init vardeq flow — which is *exactly* the uniform dequantization
the snapshot was trained with (models/vardeq.py), so the imported model's
objective is unchanged.

Core is numpy-only; torch is touched only in load/save_torch_snapshot.
"""

from __future__ import annotations

from typing import Any, Mapping

import numpy as np

from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.ops.invconv_xla import LUParams

Params = dict[str, Any]

# Container keys under which the lineage's train-loop snapshots nest the
# model state_dict (Builder saves {"graph": ..., "optim": ..., step}).
_STATE_DICT_KEYS = ("graph", "model", "state_dict", "model_state_dict", "net")
_STEP_KEYS = ("global_step", "step")


def _np(x) -> np.ndarray:
    """torch.Tensor / jax.Array / ndarray -> float/int numpy array."""
    if hasattr(x, "detach"):  # torch.Tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def _vec(x, c: int, name: str) -> np.ndarray:
    """Per-channel parameter in any broadcast shape -> (C,) f32."""
    v = _np(x).astype(np.float32).reshape(-1)
    if v.shape != (c,):
        raise ValueError(f"{name}: expected {c} channels, got shape {_np(x).shape}")
    return v


def _conv_w_in(x, name: str) -> np.ndarray:
    """torch conv weight (out,in,kh,kw) -> ours (kh,kw,in,out)."""
    w = _np(x).astype(np.float32)
    if w.ndim != 4:
        raise ValueError(f"{name}: expected 4-D conv weight, got {w.shape}")
    return np.transpose(w, (2, 3, 1, 0))


def _conv_w_out(w: np.ndarray) -> np.ndarray:
    return np.transpose(np.asarray(w, np.float32), (3, 2, 0, 1))


def _p_idx_from(p, c: int, name: str) -> np.ndarray:
    """Permutation as one-hot matrix or index vector -> our p_idx (C,) i32.

    Convention (invconv_xla.LUParams): P @ M == M[p_idx]."""
    arr = _np(p)
    if arr.ndim == 2:
        if arr.shape != (c, c):
            raise ValueError(f"{name}: permutation matrix must be ({c},{c}), got {arr.shape}")
        idx = np.argmax(arr, axis=1).astype(np.int32)
        onehot = np.zeros((c, c), np.float32)
        onehot[np.arange(c), idx] = 1.0
        if not np.allclose(arr.astype(np.float32), onehot):
            raise ValueError(f"{name}: not a permutation matrix")
        return idx
    idx = arr.reshape(-1).astype(np.int32)
    if sorted(idx.tolist()) != list(range(c)):
        raise ValueError(f"{name}: not a permutation of range({c})")
    return idx


# ---------------------------------------------------------------------------
# Export: our pytree -> lineage-named state_dict
# ---------------------------------------------------------------------------


def _export_conv2d(prefix: str, p: Params, out: dict) -> None:
    out[f"{prefix}.weight"] = _conv_w_out(p["w"])
    out[f"{prefix}.actnorm.bias"] = np.asarray(p["actnorm"]["bias"], np.float32).reshape(1, -1, 1, 1)
    out[f"{prefix}.actnorm.logs"] = np.asarray(p["actnorm"]["logs"], np.float32).reshape(1, -1, 1, 1)


def _export_conv2d_zeros(prefix: str, p: Params, out: dict) -> None:
    out[f"{prefix}.weight"] = _conv_w_out(p["w"])
    out[f"{prefix}.bias"] = np.asarray(p["b"], np.float32)
    out[f"{prefix}.logs"] = np.asarray(p["logs"], np.float32).reshape(-1, 1, 1)


def _export_linear_zeros(prefix: str, p: Params, out: dict) -> None:
    out[f"{prefix}.weight"] = np.asarray(p["w"], np.float32).T
    out[f"{prefix}.bias"] = np.asarray(p["b"], np.float32)
    out[f"{prefix}.logs"] = np.asarray(p["logs"], np.float32)


def _export_step(prefix: str, sp: Params, cfg: GlowConfig, out: dict) -> None:
    out[f"{prefix}.actnorm.bias"] = np.asarray(sp["actnorm"]["bias"], np.float32).reshape(1, -1, 1, 1)
    out[f"{prefix}.actnorm.logs"] = np.asarray(sp["actnorm"]["logs"], np.float32).reshape(1, -1, 1, 1)
    perm = sp["perm"]
    if "lu" in perm:
        lu: LUParams = perm["lu"]
        c = int(np.asarray(lu.log_s).shape[0])
        p_mat = np.zeros((c, c), np.float32)
        p_mat[np.arange(c), np.asarray(lu.p_idx)] = 1.0
        out[f"{prefix}.invconv.p"] = p_mat
        out[f"{prefix}.invconv.sign_s"] = np.asarray(lu.sign_s, np.float32)
        out[f"{prefix}.invconv.lower"] = np.tril(np.asarray(lu.l_raw, np.float32), -1)
        out[f"{prefix}.invconv.log_s"] = np.asarray(lu.log_s, np.float32)
        out[f"{prefix}.invconv.upper"] = np.triu(np.asarray(lu.u_raw, np.float32), 1)
        # Constant masks the lineage registers as buffers (so the exported
        # dict loads into it without strict=False):
        out[f"{prefix}.invconv.l_mask"] = np.tril(np.ones((c, c), np.float32), -1)
        out[f"{prefix}.invconv.eye"] = np.eye(c, dtype=np.float32)
    elif "w" in perm:
        out[f"{prefix}.invconv.weight"] = np.asarray(perm["w"], np.float32)
    else:
        mode = cfg.flow_permutation  # "shuffle" | "reverse"
        out[f"{prefix}.{mode}.indices"] = np.asarray(perm["idx"], np.int64)
        out[f"{prefix}.{mode}.indices_inverse"] = np.asarray(perm["inv_idx"], np.int64)
    cp = sp["coupling"]
    _export_conv2d(f"{prefix}.f.0", cp["conv1"], out)
    _export_conv2d(f"{prefix}.f.2", cp["conv2"], out)
    _export_conv2d_zeros(f"{prefix}.f.4", cp["conv3"], out)


def export_state_dict(params: Params, cfg: GlowConfig) -> dict[str, np.ndarray]:
    """Our param pytree -> a state_dict in the reference lineage's naming.

    Covers the Glow core (flow + top); a ``vardeq`` subtree (no reference
    counterpart) is skipped — at zero-init it IS uniform dequantization, so
    nothing the lineage can represent is lost.
    """
    out: dict[str, np.ndarray] = {}
    j = 0  # torch FlowNet layer index (counts paramless Squeeze layers)
    for i, level in enumerate(params["levels"]):
        j += 1  # SqueezeLayer
        stacked = level["steps"]
        for k in range(cfg.K):
            sp = _tree_index(stacked, k)
            _export_step(f"flow.layers.{j}", sp, cfg, out)
            j += 1
        if level["split"] is not None:
            _export_conv2d_zeros(f"flow.layers.{j}.conv", level["split"]["prior_conv"], out)
            j += 1
    top = params["top"]
    if "learn_top" in top:
        _export_conv2d_zeros("learn_top", top["learn_top"], out)
    if "project_ycond" in top:
        _export_linear_zeros("project_ycond", top["project_ycond"], out)
        _export_linear_zeros("project_class", top["project_class"], out)
    return out


def _tree_index(stacked: Params, k: int):
    import jax

    return jax.tree.map(lambda a: np.asarray(a)[k], stacked)


# ---------------------------------------------------------------------------
# Import: lineage state_dict -> our pytree
# ---------------------------------------------------------------------------


def _group_flow_layers(sd: Mapping[str, Any]) -> list[dict[str, Any]]:
    """Group keys by `flow.layers.{j}.`, returned in ascending j."""
    import re

    groups: dict[int, dict[str, Any]] = {}
    for key, val in sd.items():
        m = re.match(r"^flow\.layers\.(\d+)\.(.+)$", key)
        if m:
            groups.setdefault(int(m.group(1)), {})[m.group(2)] = val
    return [groups[j] for j in sorted(groups)]


def _import_conv2d(g: Mapping[str, Any], prefix: str, c_out: int) -> Params:
    return {
        "w": _conv_w_in(g[f"{prefix}.weight"], f"{prefix}.weight"),
        "actnorm": {
            "bias": _vec(g[f"{prefix}.actnorm.bias"], c_out, f"{prefix}.actnorm.bias"),
            "logs": _vec(g[f"{prefix}.actnorm.logs"], c_out, f"{prefix}.actnorm.logs"),
        },
    }


def _import_conv2d_zeros(g: Mapping[str, Any], prefix: str, c_out: int) -> Params:
    return {
        "w": _conv_w_in(g[f"{prefix}.weight"], f"{prefix}.weight"),
        "b": _vec(g[f"{prefix}.bias"], c_out, f"{prefix}.bias"),
        "logs": _vec(g[f"{prefix}.logs"], c_out, f"{prefix}.logs"),
    }


def _import_step(g: Mapping[str, Any], c: int, cfg: GlowConfig) -> Params:
    from pytorch_glow_tpu.models.layers import permutation_kind

    sp: Params = {
        "actnorm": {
            "bias": _vec(g["actnorm.bias"], c, "actnorm.bias"),
            "logs": _vec(g["actnorm.logs"], c, "actnorm.logs"),
        }
    }
    kind = permutation_kind(cfg.flow_permutation, cfg.lu_decomposed)
    if kind == "lu":
        sp["perm"] = {
            "lu": LUParams(
                p_idx=_p_idx_from(g["invconv.p"], c, "invconv.p"),
                l_raw=np.tril(_np(g["invconv.lower"]).astype(np.float32), -1),
                u_raw=np.triu(_np(g["invconv.upper"]).astype(np.float32), 1),
                log_s=_vec(g["invconv.log_s"], c, "invconv.log_s"),
                sign_s=_vec(g["invconv.sign_s"], c, "invconv.sign_s"),
            )
        }
    elif kind == "plain":
        w = _np(g["invconv.weight"]).astype(np.float32).reshape(c, c)
        sp["perm"] = {"w": w}
    else:  # fixed shuffle/reverse
        pfx = cfg.flow_permutation
        if f"{pfx}.indices" not in g:  # tolerate the sibling attribute name
            pfx = "shuffle" if pfx == "reverse" else "reverse"
        idx = _np(g[f"{pfx}.indices"]).reshape(-1).astype(np.int32)
        if f"{pfx}.indices_inverse" in g:
            inv = _np(g[f"{pfx}.indices_inverse"]).reshape(-1).astype(np.int32)
        else:
            inv = np.argsort(idx).astype(np.int32)
        sp["perm"] = {"idx": idx, "inv_idx": inv}
    c_half = c // 2
    c_out = c_half if cfg.flow_coupling == "additive" else c
    sp["coupling"] = {
        "conv1": _import_conv2d(g, "f.0", cfg.hidden_channels),
        "conv2": _import_conv2d(g, "f.2", cfg.hidden_channels),
        "conv3": _import_conv2d_zeros(g, "f.4", c_out),
    }
    return sp


def import_state_dict(
    sd: Mapping[str, Any],
    cfg: GlowConfig,
    rename: Mapping[str, str] | None = None,
) -> Params:
    """Lineage state_dict -> our param pytree (jnp arrays, scan-stacked).

    ``rename``: prefix rewrites applied first (e.g. {"flownet.": "flow."})
    for forks whose attribute names deviate from the documented [M] naming.
    DataParallel's "module." prefix is always stripped.
    """
    import jax
    import jax.numpy as jnp

    clean: dict[str, Any] = {}
    for key, val in sd.items():
        if key.startswith("module."):
            key = key[len("module."):]
        for old, new in (rename or {}).items():
            if key.startswith(old):
                key = new + key[len(old):]
        clean[key] = val

    groups = _group_flow_layers(clean)
    expected = cfg.L * cfg.K + (cfg.L - 1)
    if len(groups) != expected:
        raise ValueError(
            f"snapshot has {len(groups)} param-bearing flow layers, config "
            f"K={cfg.K} L={cfg.L} implies {expected} (K steps per level + "
            f"{cfg.L - 1} splits; Squeeze layers carry no params)"
        )

    shapes = cfg.latent_shapes()
    levels = []
    gi = 0
    for i, (_, _, c) in enumerate(shapes):
        steps = []
        for _ in range(cfg.K):
            g = groups[gi]
            if "actnorm.bias" not in g:
                raise ValueError(
                    f"flow layer group {gi}: expected a FlowStep "
                    f"(actnorm.bias), found keys {sorted(g)[:4]}"
                )
            steps.append(_import_step(g, c, cfg))
            gi += 1
        stacked = jax.tree.map(
            lambda *xs: jnp.stack([jnp.asarray(x) for x in xs], axis=0), *steps
        )
        split = None
        if i < cfg.L - 1:
            g = groups[gi]
            if "conv.weight" not in g:
                raise ValueError(
                    f"flow layer group {gi}: expected a Split2d (conv.weight), "
                    f"found keys {sorted(g)[:4]}"
                )
            split = {"prior_conv": _import_conv2d_zeros(g, "conv", c)}
            gi += 1
        levels.append({"steps": stacked, "split": split})

    _, _, c_final = shapes[-1]
    top: Params = {}
    if cfg.learn_top:
        if "learn_top.weight" not in clean:
            raise ValueError("config has learn_top=True but snapshot lacks learn_top.*")
        top["learn_top"] = _import_conv2d_zeros(clean, "learn_top", 2 * c_final)
    if cfg.y_condition:
        for name, (d_in, d_out) in (
            ("project_ycond", (cfg.y_classes, 2 * c_final)),
            ("project_class", (c_final, cfg.y_classes)),
        ):
            if f"{name}.weight" not in clean:
                raise ValueError(f"config has y_condition=True but snapshot lacks {name}.*")
            w = _np(clean[f"{name}.weight"]).astype(np.float32)
            if w.shape != (d_out, d_in):
                raise ValueError(f"{name}.weight: expected {(d_out, d_in)}, got {w.shape}")
            top[name] = {
                "w": w.T,
                "b": _vec(clean[f"{name}.bias"], d_out, f"{name}.bias"),
                "logs": _vec(clean[f"{name}.logs"], d_out, f"{name}.logs"),
            }
    params: Params = {
        "levels": jax.tree.map(jnp.asarray, levels),
        "top": jax.tree.map(jnp.asarray, top),
    }
    if cfg.dequant == "variational":
        # No reference counterpart; zero-init == exactly uniform dequant
        # (models/vardeq.py), so the imported objective is unchanged.
        from pytorch_glow_tpu.models import vardeq

        params["vardeq"] = vardeq.vardeq_init(jax.random.key(0), cfg)
    return params


# ---------------------------------------------------------------------------
# Snapshot files (torch at the IO edge only)
# ---------------------------------------------------------------------------


def load_torch_snapshot(path: str) -> tuple[dict[str, Any], int]:
    """Read a lineage snapshot .pth -> (state_dict, global_step).

    Accepts a bare state_dict or the Builder's container dict
    ({"graph": state_dict, ..., "global_step": N})."""
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if not isinstance(obj, dict):
        raise ValueError(f"unsupported snapshot object: {type(obj)}")
    step = 0
    for k in _STEP_KEYS:
        if isinstance(obj.get(k), int):
            step = obj[k]
            break
    if all(hasattr(v, "detach") or isinstance(v, np.ndarray) for v in obj.values()) and obj:
        return dict(obj), step
    for k in _STATE_DICT_KEYS:
        inner = obj.get(k)
        if isinstance(inner, dict) and inner:
            return dict(inner), step
    raise ValueError(
        f"no state_dict found in snapshot (top-level keys: {sorted(obj)[:8]}; "
        f"looked under {_STATE_DICT_KEYS})"
    )


def save_torch_snapshot(path: str, params: Params, cfg: GlowConfig, step: int = 0) -> None:
    """Write our params as a lineage-style container snapshot."""
    import torch

    sd = {
        k: torch.from_numpy(np.array(v, copy=True))
        for k, v in export_state_dict(params, cfg).items()
    }
    torch.save({"graph": sd, "global_step": int(step)}, path)
