"""Variational dequantization (models/vardeq.py, beyond-reference:
Flow++-style learned q(u|x)).  The load-bearing invariant: at zero-init the
q-flow is EXACTLY the identity, so the objective coincides bit-for-bit with
uniform dequantization and training can only tighten the bound."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pytorch_glow_tpu.config import GlowConfig
from pytorch_glow_tpu.models import glow, vardeq

CFG = GlowConfig(
    image_shape=(8, 8, 3),
    hidden_channels=16,
    K=2,
    L=2,
    dequant="variational",
    vardeq_steps=2,
    vardeq_width=16,
    vardeq_context_width=8,
)


def _x(batch=4, key=1):
    x_u8 = jax.random.randint(jax.random.key(key), (batch, *CFG.image_shape), 0, 256, jnp.uint8)
    return glow.preprocess(x_u8, CFG)


def test_vardeq_identity_at_init_neg_log_q_is_exactly_zero():
    params = glow.init_glow(jax.random.key(0), CFG)
    assert "vardeq" in params
    x = _x()
    x_deq, neg_log_q = vardeq.vardeq_apply(params["vardeq"], jax.random.key(2), x, CFG)
    # Zero-init couplings + zero-init final affine => w == eps bitwise =>
    # log q(u|x) == 0 EXACTLY (uniform), not just approximately.
    assert np.all(np.asarray(neg_log_q) == 0.0)
    # ... and u = sigmoid(logit(u0)) recovers the uniform draw: noise is
    # strictly inside the quantization bin.
    d = np.asarray(x_deq - x)
    assert (d > 0).all() and (d < 1.0 / CFG.n_bins).all()


def test_vardeq_log_prob_and_metrics_wiring():
    params = glow.init_glow(jax.random.key(0), CFG)
    x = _x()
    out = glow.log_prob(params, x, CFG, rng=jax.random.key(3))
    assert out["neg_log_q"].shape == (x.shape[0],)
    loss, metrics = glow.loss_fn(params, x, CFG, rng=jax.random.key(3))
    assert np.isfinite(float(loss))
    assert float(metrics["vardeq_logq_bits"]) == 0.0  # identity at init
    # Deterministic eval (rng=None) must not touch q at all.
    out_eval = glow.log_prob(params, x, CFG, rng=None)
    assert "neg_log_q" not in out_eval


def test_vardeq_params_receive_gradients():
    params = glow.init_glow(jax.random.key(0), CFG)
    x = _x(batch=8)

    def loss_of_vd(vd):
        return glow.loss_fn({**params, "vardeq": vd}, x, CFG, rng=jax.random.key(4))[0]

    g = jax.grad(loss_of_vd)(params["vardeq"])
    leaves = jax.tree.leaves(g)
    gnorm = float(sum(jnp.sum(jnp.abs(l)) for l in leaves))
    assert np.isfinite(gnorm) and gnorm > 0.0


def test_vardeq_ddi_preserves_param_groups():
    params = glow.init_glow(jax.random.key(0), CFG)
    x = glow.dequantize(jax.random.key(5), _x(batch=16), CFG)
    inited = glow.ddi_init(params, x, CFG)
    assert set(inited) == set(params)
    same = jax.tree.map(
        lambda a, b: bool(jnp.all(a == b)), params["vardeq"], inited["vardeq"]
    )
    assert all(jax.tree.leaves(same))


def test_vardeq_trains_resumes_end_to_end(tmp_path):
    """Builder/trainer/checkpoint integration: the vardeq branch survives
    DDI, training steps, orbax save, and resume."""
    from pytorch_glow_tpu.train.builder import build
    from pytorch_glow_tpu.train.trainer import train
    from pytorch_glow_tpu.utils.profiles import profile_from_dict

    profile = profile_from_dict(
        {
            "name": "vd",
            "glow": {
                "image_shape": [8, 8, 3], "hidden_channels": 16, "K": 2,
                "L": 2, "dequant": "variational", "vardeq_steps": 2,
                "vardeq_width": 16, "vardeq_context_width": 8,
            },
            "train": {"batch_size": 16, "num_steps": 30, "scalar_log_gap": 10,
                       "plot_gap": 0, "checkpoint_gap": 15,
                       "num_sample_images": 4},
            "data": {"name": "synthetic_smooth"},
            "out_dir": str(tmp_path),
        }
    )
    r = train(build(profile), quiet=True)
    assert r["final_step"] == 30 and np.isfinite(r["loss"])
    b2 = build(profile)
    assert b2.resumed and b2.start_step == 30
    r2 = train(b2, num_steps=40, quiet=True)
    assert r2["final_step"] == 40 and np.isfinite(r2["loss"])


def test_vardeq_sharded_train_step_runs(eight_devices):
    """Vardeq params replicate under DP x TP and the train step stays
    GSPMD-valid (the q-flow has no sharding constraints of its own)."""
    from pytorch_glow_tpu.config import MeshConfig, OptimConfig, TrainConfig
    from pytorch_glow_tpu.parallel import mesh as meshlib
    from pytorch_glow_tpu.train import step as steplib
    from pytorch_glow_tpu.train.optim import make_optimizer

    mesh = meshlib.make_mesh(MeshConfig(data=4, model=2))
    tx = make_optimizer(OptimConfig(lr=1e-3, warmup_steps=10), TrainConfig(batch_size=16))
    state = steplib.init_state(jax.random.key(0), CFG, tx)
    state["params"] = meshlib.shard_params(mesh, state["params"])
    state["opt_state"] = jax.device_put(
        state["opt_state"], meshlib.param_shardings(mesh, state["opt_state"])
    )
    x = jax.random.uniform(jax.random.key(1), (16, 8, 8, 3))
    x = jax.device_put(x, meshlib.batch_sharding(mesh))
    state["params"] = glow.ddi_init(state["params"], x, CFG)
    train_step = steplib.make_train_step(CFG, tx)
    state, metrics = train_step(state, x)
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["vardeq_logq_bits"]) == 0.0  # identity at init


def test_vardeq_can_learn_to_beat_uniform_on_smooth_data():
    """On low-entropy data the learned q should (at minimum) not hurt: after
    a few hundred identical-seed steps the variational arm's training bound
    is within noise of or better than the uniform arm's."""
    import optax

    uni = dataclasses.replace(CFG, dequant="uniform")

    from pytorch_glow_tpu.utils.tree import merge, partition

    def run(cfg, steps=300):
        params = glow.init_glow(jax.random.key(0), cfg)
        # smooth synthetic: per-image linear gradients, low entropy
        k = jax.random.key(7)
        coef = jax.random.uniform(k, (64, 1, 1, 3))
        ramp = jnp.linspace(0.0, 1.0, 8)[None, :, None, None]
        x_u8 = jnp.broadcast_to(255 * coef * ramp, (64, 8, 8, 3)).astype(jnp.uint8)
        x = glow.preprocess(x_u8, cfg)
        params = glow.ddi_init(params, glow.dequantize(jax.random.key(8), x, cfg), cfg)
        trainable, frozen = partition(params)  # LU perm indices are int32
        tx = optax.adam(1e-3)
        opt = tx.init(trainable)

        @jax.jit
        def step(trainable, opt, i):
            def loss_of(tr):
                return glow.loss_fn(
                    merge(tr, frozen), x, cfg,
                    rng=jax.random.fold_in(jax.random.key(9), i),
                )

            (_, m), g = jax.value_and_grad(loss_of, has_aux=True)(trainable)
            up, opt = tx.update(g, opt)
            return optax.apply_updates(trainable, up), opt, m["nll"]

        nll = None
        for i in range(steps):
            trainable, opt, nll = step(trainable, opt, i)
        return float(nll)

    nll_vd = run(CFG)
    nll_uni = run(uni)
    assert np.isfinite(nll_vd) and np.isfinite(nll_uni)
    # Generous margin: the claim is "does not hurt and typically helps",
    # not a tight quality bar (that needs real data + hardware scale).
    assert nll_vd <= nll_uni + 0.05, (nll_vd, nll_uni)
