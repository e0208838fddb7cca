"""Minimal PyTorch Glow re-derivation for cross-framework parity tests.

Written from the behavioral contract in SURVEY.md §2.4 (actnorm / LU 1x1
conv / affine coupling / squeeze / split math of the Glow paper and the
reference lineage) — NOT a copy of the reference implementation.  Its only
job is to evaluate the SAME math as pytorch_glow_tpu on identical weights
so the JAX/TPU build can be checked to float tolerance (north-star
requirement, BASELINE.md "Target: correctness").

Layout: NCHW (torch-native).  Weight conversion from the JAX pytree is in
`from_jax_params`.
"""

from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F


def _t(x) -> torch.Tensor:
    return torch.from_numpy(np.asarray(x)).float()


# ---------------------------------------------------------------------------
# Layer math (eval-mode only; no DDI here — params come pre-initialized)
# ---------------------------------------------------------------------------


def actnorm_fwd(p, x):
    bias = _t(p["bias"]).view(1, -1, 1, 1)
    logs = _t(p["logs"]).view(1, -1, 1, 1)
    y = (x + bias) * torch.exp(logs)
    logdet = x.shape[2] * x.shape[3] * logs.sum()
    return y, logdet


def actnorm_rev(p, y):
    bias = _t(p["bias"]).view(1, -1, 1, 1)
    logs = _t(p["logs"]).view(1, -1, 1, 1)
    return y * torch.exp(-logs) - bias


def lu_weight(lu) -> torch.Tensor:
    c = len(lu.log_s)
    l = np.tril(np.asarray(lu.l_raw), -1) + np.eye(c)
    u = np.triu(np.asarray(lu.u_raw), 1) + np.diag(
        np.asarray(lu.sign_s) * np.exp(np.asarray(lu.log_s))
    )
    w = (l @ u)[np.asarray(lu.p_idx)]
    return _t(w)


def invconv_fwd(p, x, kind):
    if kind == "fixed":
        idx = torch.from_numpy(np.asarray(p["idx"])).long()
        return x[:, idx], torch.zeros(())
    if kind == "lu":
        w = lu_weight(p["lu"])
        logdet_per_pixel = _t(p["lu"].log_s).sum()
    else:
        w = _t(p["w"])
        logdet_per_pixel = torch.slogdet(w)[1]
    y = F.conv2d(x, w.view(*w.shape, 1, 1))
    return y, x.shape[2] * x.shape[3] * logdet_per_pixel


def invconv_rev(p, y, kind):
    if kind == "fixed":
        inv_idx = torch.from_numpy(np.asarray(p["inv_idx"])).long()
        return y[:, inv_idx]
    w = lu_weight(p["lu"]) if kind == "lu" else _t(p["w"])
    w_inv = torch.inverse(w.double()).float()
    return F.conv2d(y, w_inv.view(*w_inv.shape, 1, 1))


def conv2d(p, x):
    """JAX HWIO weight -> torch OIHW; bias-free conv + output actnorm."""
    w = _t(p["w"]).permute(3, 2, 0, 1)
    pad = (w.shape[2] // 2, w.shape[3] // 2)
    y = F.conv2d(x, w, padding=pad)
    y, _ = actnorm_fwd(p["actnorm"], y)
    return y


def conv2d_zeros(p, x):
    w = _t(p["w"]).permute(3, 2, 0, 1)
    pad = (w.shape[2] // 2, w.shape[3] // 2)
    y = F.conv2d(x, w, padding=pad) + _t(p["b"]).view(1, -1, 1, 1)
    return y * torch.exp(_t(p["logs"]).view(1, -1, 1, 1) * 3.0)


def coupling_net(p, x):
    h = torch.relu(conv2d(p["conv1"], x))
    h = torch.relu(conv2d(p["conv2"], h))
    return conv2d_zeros(p["conv3"], h)


def split_ch(x, mode):
    c = x.shape[1]
    if mode == "simple":
        return x[:, : c // 2], x[:, c // 2 :]
    return x[:, 0::2], x[:, 1::2]


def cat_ch(a, b, mode):
    if mode == "simple":
        return torch.cat([a, b], dim=1)
    n, c, h, w = a.shape
    return torch.stack([a, b], dim=2).reshape(n, 2 * c, h, w)


def coupling_fwd(p, x, mode):
    z1, z2 = split_ch(x, "simple")
    h = coupling_net(p, z1)
    if mode == "additive":
        return cat_ch(z1, z2 + h, "simple"), torch.zeros(x.shape[0])
    shift, raw = split_ch(h, "cross")
    scale = torch.sigmoid(raw + 2.0)
    z2 = (z2 + shift) * scale
    logdet = torch.log(scale).flatten(1).sum(1)
    return cat_ch(z1, z2, "simple"), logdet


def coupling_rev(p, z, mode):
    z1, z2 = split_ch(z, "simple")
    h = coupling_net(p, z1)
    if mode == "additive":
        return cat_ch(z1, z2 - h, "simple")
    shift, raw = split_ch(h, "cross")
    scale = torch.sigmoid(raw + 2.0)
    return cat_ch(z1, z2 / scale - shift, "simple")


def squeeze(x):
    n, c, h, w = x.shape
    x = x.view(n, c, h // 2, 2, w // 2, 2)
    x = x.permute(0, 1, 3, 5, 2, 4).contiguous()
    return x.view(n, 4 * c, h // 2, w // 2)


def unsqueeze(z):
    n, c4, h, w = z.shape
    c = c4 // 4
    z = z.view(n, c, 2, 2, h, w)
    z = z.permute(0, 1, 4, 2, 5, 3).contiguous()
    return z.view(n, c, 2 * h, 2 * w)


def gaussian_logp(mean, logs, x):
    lik = -0.5 * (
        math.log(2 * math.pi) + 2.0 * logs + (x - mean) ** 2 * torch.exp(-2.0 * logs)
    )
    return lik.flatten(1).sum(1)


def split2d_prior(p, z1):
    h = conv2d_zeros(p["prior_conv"], z1)
    return split_ch(h, "cross")


# ---------------------------------------------------------------------------
# Full model (params = the JAX pytree, consumed directly)
# ---------------------------------------------------------------------------


def perm_kind(cfg) -> str:
    if cfg.flow_permutation == "invconv":
        return "lu" if cfg.lu_decomposed else "plain"
    return "fixed"


def step_params_at(steps, k):
    """Slice step k out of the stacked (K-leading) step-param pytree."""
    import jax

    return jax.tree.map(lambda a: np.asarray(a[k]), steps)


def encode(params, cfg, x):
    kind = perm_kind(cfg)
    logdet = torch.zeros(x.shape[0])
    z = x
    z_splits = []
    for level in params["levels"]:
        z = squeeze(z)
        for k in range(cfg.K):
            sp = step_params_at(level["steps"], k)
            z, ld = actnorm_fwd(sp["actnorm"], z)
            logdet = logdet + ld
            z, ld = invconv_fwd(sp["perm"], z, kind)
            logdet = logdet + ld
            z, ld = coupling_fwd(sp["coupling"], z, cfg.flow_coupling)
            logdet = logdet + ld
        if level["split"] is not None:
            z1, z2 = split_ch(z, "simple")
            mean, logs = split2d_prior(level["split"], z1)
            logdet = logdet + gaussian_logp(mean, logs, z2)
            z_splits.append(z2)
            z = z1
    return z, logdet, z_splits


def decode(params, cfg, z, z_splits):
    kind = perm_kind(cfg)
    for i in range(cfg.L - 1, -1, -1):
        level = params["levels"][i]
        if level["split"] is not None:
            z = cat_ch(z, z_splits[i], "simple")
        for k in range(cfg.K - 1, -1, -1):
            sp = step_params_at(level["steps"], k)
            z = coupling_rev(sp["coupling"], z, cfg.flow_coupling)
            z = invconv_rev(sp["perm"], z, kind)
            z = actnorm_rev(sp["actnorm"], z)
        z = unsqueeze(z)
    return z


def linear_zeros(p, x):
    y = x @ _t(p["w"]) + _t(p["b"])
    return y * torch.exp(_t(p["logs"]) * 3.0)


def top_prior(params, cfg, batch, y_onehot=None):
    c = cfg.final_latent_shape[-1]
    h = torch.zeros(batch, 2 * c, 1, 1)
    if cfg.learn_top:
        h = conv2d_zeros(params["top"]["learn_top"], h)
    if cfg.y_condition:
        yp = linear_zeros(params["top"]["project_ycond"], y_onehot)
        h = h + yp.view(batch, 2 * c, 1, 1)
    return split_ch(h, "simple")


def classify(params, z):
    pooled = z.mean(dim=(2, 3))
    return linear_zeros(params["top"]["project_class"], pooled)


def log_prob(params, cfg, x, y_onehot=None):
    """x in [0,1) NCHW -> (z, objective, nll bits/dim).  No dequant noise."""
    dims = int(np.prod(x.shape[1:]))
    z, logdet, _ = encode(params, cfg, x)
    mean, logs = top_prior(params, cfg, x.shape[0], y_onehot)
    objective = logdet + gaussian_logp(mean, logs, z) - dims * math.log(cfg.n_bins)
    nll = -objective / (math.log(2.0) * dims)
    return z, objective, nll
