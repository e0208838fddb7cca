#!/usr/bin/env python
"""A/B: uniform vs variational dequantization at a matched step budget.

Trains two identical Glow models (same seeds, data stream, optimizer) that
differ ONLY in `dequant`, then scores both on held-out batches with the
VALID discrete-NLL bounds (glow.nll_bound): single-draw ELBO (the published
protocol) and IWAE-8.  The variational arm's learned q(u|x) folds into the
bound automatically; Flow++ measures ~0.06-0.1 bits/dim from this at paper
scale.  Prints one JSON line per arm plus the deltas.

Host-side job (CPU by default; --tpu to use the tunneled chip).

  python scripts/vardeq_ab.py --steps 4000 --size 16 --out /tmp/vardeq_ab
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=4000)
    p.add_argument("--size", type=int, default=16, help="image H=W")
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--width", type=int, default=64)
    p.add_argument("--K", type=int, default=4)
    p.add_argument("--L", type=int, default=2)
    p.add_argument("--vardeq-steps", type=int, default=4)
    p.add_argument("--vardeq-width", type=int, default=32)
    p.add_argument("--eval-batches", type=int, default=16)
    p.add_argument("--iwae-samples", type=int, default=8)
    p.add_argument("--synthetic", default="textured",
                   choices=["uniform", "smooth", "textured"])
    p.add_argument("--out", default="/tmp/vardeq_ab")
    p.add_argument("--tpu", action="store_true")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    if not args.tpu:
        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from pytorch_glow_tpu.config import (
        DataConfig, GlowConfig, OptimConfig, Profile, TrainConfig,
    )
    from pytorch_glow_tpu.data import pipeline
    from pytorch_glow_tpu.models import glow
    from pytorch_glow_tpu.train import builder as builderlib
    from pytorch_glow_tpu.train import trainer as trainerlib

    data_name = {"uniform": "synthetic", "smooth": "synthetic_smooth",
                 "textured": "synthetic_textured"}[args.synthetic]

    def make_profile(dequant: str) -> Profile:
        return Profile(
            name=f"ab-{dequant}",
            glow=GlowConfig(
                image_shape=(args.size, args.size, 3),
                hidden_channels=args.width, K=args.K, L=args.L,
                dequant=dequant, vardeq_steps=args.vardeq_steps,
                vardeq_width=args.vardeq_width,
                vardeq_context_width=args.vardeq_width // 2,
            ),
            optim=OptimConfig(lr=5e-4, warmup_steps=200, schedule="noam"),
            train=TrainConfig(
                batch_size=args.batch_size, num_steps=args.steps,
                scalar_log_gap=max(100, args.steps // 20), plot_gap=0,
                checkpoint_gap=0, eval_gap=0, num_sample_images=4, seed=0,
            ),
            data=DataConfig(name=data_name, image_size=args.size),
            out_dir=args.out,
        )

    results = {}
    for dequant in ("uniform", "variational"):
        prof = make_profile(dequant)
        built = builderlib.build(prof)
        r = trainerlib.train(built, quiet=True)
        params = built.state["params"]
        cfg = prof.glow

        eval_it = pipeline.make_dataset(prof.data, cfg, prof.train, split="test")
        elbo_sum = iwae_sum = corner_sum = 0.0
        count = 0
        import itertools

        for bi, batch in enumerate(itertools.islice(eval_it, args.eval_batches)):
            x = glow.preprocess(np.asarray(batch["image"]), cfg)
            rng = jax.random.fold_in(jax.random.key(7), bi)
            elbo = glow.nll_bound(params, x, cfg, rng, samples=1, bound="elbo")
            iwae = glow.nll_bound(
                params, x, cfg, rng, samples=args.iwae_samples, bound="iwae"
            )
            corner = glow.log_prob(params, x, cfg, rng=None)["nll"]
            elbo_sum += float(np.sum(elbo))
            iwae_sum += float(np.sum(iwae))
            corner_sum += float(np.sum(corner))
            count += x.shape[0]

        results[dequant] = {
            "dequant": dequant,
            "train_loss_final": r["loss"],
            "elbo_bits_dim": elbo_sum / count,
            f"iwae{args.iwae_samples}_bits_dim": iwae_sum / count,
            "corner_bits_dim": corner_sum / count,
            "eval_images": count,
            "steps": r["final_step"],
            "wall_s": r["wall_s"],
        }
        print(json.dumps(results[dequant]), flush=True)

    u, v = results["uniform"], results["variational"]
    print(json.dumps({
        "delta_elbo_bits_dim": u["elbo_bits_dim"] - v["elbo_bits_dim"],
        f"delta_iwae{args.iwae_samples}_bits_dim":
            u[f"iwae{args.iwae_samples}_bits_dim"] - v[f"iwae{args.iwae_samples}_bits_dim"],
        "positive_means_variational_wins": True,
        "synthetic": args.synthetic, "size": args.size, "steps": args.steps,
    }), flush=True)


if __name__ == "__main__":
    main()
