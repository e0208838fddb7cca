#!/usr/bin/env python
"""Inference CLI: sampling, reconstruction, attribute manipulation.

Reference CLI surface (upstream:infer.py; SURVEY.md §2.1 #2): operations on
a trained snapshot, parameterized by the training profile.

Usage:
  python infer.py sample    <profile> -n 16 --temperature 0.7 -o samples.png
  python infer.py recon     <profile> --data-root ... -o recon.png
  python infer.py delta     <profile> --data-root ... -o delta.npz [--batches 50]
  python infer.py manipulate <profile> --delta delta.npz --attr 31 \\
                             --strength 1.5 --data-root ... -o manip.png
  python infer.py interpolate <profile> --data-root ... -o interp.png
  python infer.py nll       <profile> --data-root ...
  python infer.py export    <profile> -o artifact_dir [--batch-size 16]
  python infer.py serve     <artifact_dir> -o samples.png --temperature 0.7

`export` writes a self-contained jax.export (StableHLO) serving artifact —
trained params baked in; `serve` runs one WITHOUT model code or checkpoints
(pytorch_glow_tpu/serve.py).
"""

from __future__ import annotations

import argparse
import itertools
import json
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter)
    p.add_argument("op", choices=["sample", "recon", "delta", "manipulate",
                                  "interpolate", "nll", "report", "export",
                                  "serve"])
    p.add_argument("profile",
                   help="profile JSON/preset (op=serve: the artifact directory)")
    p.add_argument("--batch-size", default="16",
                   help="serving batch for op=export: an int, or 'dynamic' "
                        "for a symbolic batch (one artifact, any batch)")
    p.add_argument("--platforms", default=None,
                   help="comma-separated lowering targets for op=export "
                        "(e.g. 'tpu,cpu'); default: current backend")
    p.add_argument("--keep-kernels", action="store_true",
                   help="export the Pallas fused-kernel path (TPU-only "
                        "artifact) instead of the portable XLA path")
    p.add_argument("-n", "--num", type=int, default=16)
    p.add_argument("--temperature", type=float, default=0.7)
    p.add_argument("--data-root", default=None)
    p.add_argument("--set", action="append", default=[], dest="overrides",
                   metavar="SEC.KEY=VAL",
                   help="override any profile field (same as train.py --set)")
    p.add_argument("--synthetic", nargs="?", const="uniform", default=None,
                   choices=["uniform", "smooth", "textured", "attr"],
                   help="force synthetic data (same families as train.py)")
    p.add_argument("--delta", default=None, help="path to attribute-delta .npz")
    p.add_argument("--attr", type=int, default=0, help="attribute index")
    p.add_argument("--strength", type=float, default=1.0)
    p.add_argument("--batches", type=int, default=50, help="batches for delta/nll")
    p.add_argument("--dequant-samples", type=int, default=0,
                   help="op=nll: average a VALID discrete-NLL bound over N "
                        "dequantization-noise draws (0 = legacy noise-free "
                        "eval at the bin corner; 1 = the standard published "
                        "protocol)")
    p.add_argument("--bound", choices=["elbo", "iwae"], default="elbo",
                   help="op=nll with --dequant-samples N>1: mean of "
                        "per-draw bounds (elbo) or the tighter logsumexp "
                        "importance bound (iwae)")
    p.add_argument("--steps", type=int, default=8, help="interpolation steps")
    p.add_argument("--swd-images", type=int, default=128,
                   help="op=report: images per set for the multi-scale "
                        "sliced-Wasserstein sample-quality metric "
                        "(0 disables; needs >=64 for a stable estimate)")
    p.add_argument("--class-id", type=int, default=None,
                   help="op=sample on a y-conditional profile: sample this "
                        "class (one-hot prior shift); default unconditional")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--exact", action="store_true",
                   help="run inference on the exact f32/XLA path regardless "
                        "of the profile's bf16/fused-kernel training "
                        "settings (same trained params; eliminates the "
                        "documented bf16 round-trip drift)")
    p.add_argument("--ema", action="store_true",
                   help="use EMA (Polyak-averaged) params if the snapshot has them")
    p.add_argument("--best", action="store_true",
                   help="load the best-eval-NLL snapshot instead of the latest")
    p.add_argument("--out-dir", default=None, help="training out-dir (to locate checkpoints)")
    p.add_argument("--cpu", action="store_true",
                   help="run on the host CPU (this box's TPU boot hook "
                        "force-selects the tunneled chip over JAX_PLATFORMS; "
                        "exports lowered with --platforms tpu,cpu stay "
                        "portable either way)")
    p.add_argument("-o", "--output", default="infer_out.png")
    return p.parse_args(argv)


def main(argv=None):
    args = parse_args(argv)
    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pytorch_glow_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    import train as train_cli
    from pytorch_glow_tpu.inference import Inferer
    from pytorch_glow_tpu.train.builder import build
    from pytorch_glow_tpu.utils.image import save_image_grid

    if args.op == "serve":
        # The artifact is self-contained: no profile, checkpoint, or model
        # code — `profile` here is the artifact directory.
        from pytorch_glow_tpu.serve import load_artifact

        model = load_artifact(args.profile)
        n = args.num if model.batch_size == "dynamic" else None
        imgs = model.sample(seed=args.seed, temperature=args.temperature, n=n)
        save_image_grid(args.output, imgs)
        print(f"wrote {args.output} ({imgs.shape[0]} samples @ "
              f"T={args.temperature} from artifact {args.profile})")
        return

    overrides = list(args.overrides)
    if args.exact:
        # The checkpoint's params are dtype-independent (f32 storage;
        # compute_dtype only casts at compute), so the exact path is a pure
        # inference-time choice.  Force EVERY precision-affecting knob, not
        # just the dtype: a profile trained with the Pallas invconv or a
        # lowered matmul precision must not leak into the "exact" promise.
        exact = {
            "glow.compute_dtype": "float32",
            "glow.flowstep_impl": "xla",
            "glow.invconv_impl": "xla",
            "glow.invconv_precision": "highest",
        }
        for ov in overrides:
            key = ov.split("=", 1)[0].strip()
            if key in exact:
                print(f"[infer] warning: --exact overrides your -o {ov!r} "
                      f"with {key}={exact[key]}", file=sys.stderr)
        overrides += [f"{k}={v}" for k, v in exact.items()]
    ns = argparse.Namespace(
        profile=args.profile, data_root=args.data_root, steps=None, batch_size=None,
        out_dir=args.out_dir, synthetic=args.synthetic, seed=None, quiet=True,
        overrides=overrides,
    )
    prof = train_cli.resolve_profile(ns)
    built = build(prof, training=False, with_data=args.op not in ("sample", "export"),
                  restore="best" if args.best else "latest")
    if not built.resumed:
        if args.best:
            # A fresh init can never be the "best" snapshot of anything —
            # scoring it silently once produced garbage report numbers when
            # --out-dir pointed one level too deep (build() appends
            # profile.name).  Fail loudly instead.
            sys.exit(f"error: --best requested but no checkpoint found under "
                     f"{os.path.join(prof.out_dir, prof.name)}")
        print("[infer] warning: no checkpoint found — using fresh (DDI-less) params",
              file=sys.stderr)
    params = built.state["params"]
    if args.ema:
        from pytorch_glow_tpu.train.step import ema_params

        if "ema" in built.state:
            params = ema_params(built.state)
        else:
            print("[infer] warning: --ema requested but snapshot has no EMA state",
                  file=sys.stderr)
    if args.op == "export":
        from pytorch_glow_tpu.serve import export_artifact

        platforms = tuple(args.platforms.split(",")) if args.platforms else None
        bs = args.batch_size if args.batch_size == "dynamic" else int(args.batch_size)
        man = export_artifact(params, prof.glow, args.output,
                              batch_size=bs, platforms=platforms,
                              keep_kernels=args.keep_kernels)
        total = sum(f["bytes"] for f in man["functions"].values())
        print(f"wrote artifact {args.output}: "
              f"{sorted(man['functions'])} b={args.batch_size} "
              f"platforms={man['platforms']} ({total / 1e6:.1f} MB)")
        return

    inferer = Inferer(params, prof.glow)
    rng = jax.random.key(args.seed)

    if args.op == "sample":
        y = None
        if args.class_id is not None:
            if not prof.glow.y_condition:
                sys.exit("error: --class-id requires a y-conditional profile")
            if not 0 <= args.class_id < prof.glow.y_classes:
                sys.exit(
                    f"error: --class-id {args.class_id} out of range "
                    f"[0, {prof.glow.y_classes})"
                )
            import jax.numpy as jnp

            y = jax.nn.one_hot(
                jnp.full((args.num,), args.class_id), prof.glow.y_classes
            )
        imgs = inferer.sample(args.num, temperature=args.temperature, rng=rng,
                              y_onehot=y)
        save_image_grid(args.output, imgs)
        cls = f", class {args.class_id}" if y is not None else ""
        print(f"wrote {args.output} ({args.num} samples @ T={args.temperature}{cls})")
        return

    batch = next(built.data)
    if args.op == "recon":
        imgs = np.asarray(batch["image"])[: args.num]
        rec = inferer.reconstruct(imgs)
        interleaved = np.stack([imgs, rec], 1).reshape(-1, *imgs.shape[1:])
        save_image_grid(args.output, interleaved, ncol=2)
        err = np.abs(imgs.astype(np.float32) - rec.astype(np.float32)).max()
        print(f"wrote {args.output}; max |x - rec| = {err}")
        return

    if args.op == "delta":
        if "attr" not in batch and "label" not in batch:
            sys.exit("error: delta requires a dataset with attributes "
                     "(CelebA) or class labels (image_folder subdirs)")
        it = itertools.chain([batch], built.data)
        delta = inferer.compute_attribute_delta(it, num_batches=args.batches)
        Inferer.save_attribute_delta(args.output, delta)
        print(f"wrote {args.output} (delta shape {delta.shape})")
        return

    if args.op == "manipulate":
        if not args.delta or not os.path.isfile(args.delta):
            sys.exit("error: --delta <file.npz> required (run `infer.py delta` first)")
        delta = Inferer.load_attribute_delta(args.delta)
        imgs = np.asarray(batch["image"])[: args.num]
        out = inferer.manipulate(imgs, delta, args.attr, args.strength)
        interleaved = np.stack([imgs, out], 1).reshape(-1, *imgs.shape[1:])
        save_image_grid(args.output, interleaved, ncol=2)
        print(f"wrote {args.output} (attr {args.attr}, strength {args.strength})")
        return

    if args.op == "interpolate":
        imgs = np.asarray(batch["image"])
        out = inferer.interpolate(imgs[0], imgs[1], steps=args.steps)
        save_image_grid(args.output, out, ncol=args.steps)
        print(f"wrote {args.output}")
        return

    if args.op == "nll":
        from pytorch_glow_tpu.train.builder import _labels_to_onehot

        total, count = 0.0, 0
        it = itertools.chain([batch], built.data)
        for bi, b in enumerate(itertools.islice(it, args.batches)):
            # y-conditional profiles need y_onehot for the prior shift.
            y = _labels_to_onehot(b, prof)
            if args.dequant_samples > 0:
                import jax as _jax

                nll = inferer.nll_bound(
                    np.asarray(b["image"]), samples=args.dequant_samples,
                    bound=args.bound,
                    rng=_jax.random.fold_in(_jax.random.key(args.seed), bi),
                    y_onehot=y,
                )
            else:
                nll = inferer.nll(np.asarray(b["image"]), y)
            total += float(nll.sum())
            count += nll.shape[0]
        how = (
            f"{args.bound} bound, {args.dequant_samples} noise draws"
            if args.dequant_samples > 0 else "noise-free (bin corner)"
        )
        print(f"nll: {total / count:.4f} bits/dim over {count} images ({how})")
        return

    if args.op == "report":
        # One-command model quality report: sample grids across a
        # temperature ladder, exact-round-trip drift, latent interpolation,
        # and all three NLL protocols, written to a directory with a
        # machine-readable report.json.
        from pytorch_glow_tpu.train.builder import _labels_to_onehot

        # -o's generic default is a .png filename; reports are directories.
        out_dir = args.output if not args.output.endswith(".png") else "report"
        os.makedirs(out_dir, exist_ok=True)
        report = {
            "profile": prof.name,
            "step": int(built.state["step"]),
            "snapshot": "best" if args.best else "latest",
            "ema": bool(args.ema),
            "params_millions": round(
                sum(p.size for p in jax.tree.leaves(params)) / 1e6, 3
            ),
            "image_shape": list(prof.glow.image_shape),
            "temperatures": [0.25, 0.5, 0.7, 1.0],
        }

        y0 = _labels_to_onehot(batch, prof)
        if y0 is not None and y0.shape[0] != args.num:
            # The data batch sizes y0; -n may ask for more/fewer samples.
            y0 = np.asarray(y0)[np.arange(args.num) % y0.shape[0]]
        for t_ in report["temperatures"]:
            imgs = inferer.sample(
                args.num, temperature=t_,
                rng=jax.random.fold_in(rng, int(t_ * 100)),
                y_onehot=y0,
            )
            save_image_grid(os.path.join(out_dir, f"samples_t{t_:.2f}.png"), imgs)

        imgs = np.asarray(batch["image"])[: args.num]
        rec = inferer.reconstruct(imgs)
        interleaved = np.stack([imgs, rec], 1).reshape(-1, *imgs.shape[1:])
        save_image_grid(os.path.join(out_dir, "recon.png"), interleaved, ncol=2)
        drift = np.abs(imgs.astype(np.int16) - rec.astype(np.int16))
        report["recon_drift_u8"] = {
            "max": int(drift.max()),
            "mean": float(drift.mean()),
            "frac_gt_1_bin": float((drift > 1).mean()),
        }

        interp = inferer.interpolate(imgs[0], imgs[1], steps=args.steps)
        save_image_grid(os.path.join(out_dir, "interpolate.png"), interp,
                        ncol=args.steps)

        if "attr" in batch or "label" in batch:
            # Attribute-manipulation demo: delta over --batches batches, then
            # one grid per attribute (rows = images, cols = strength ladder).
            # On synthetic_attr the closed-form detectors also score the edit
            # (data/synth_attrs.py), making the demo quantitative.
            strengths = [-1.5, -0.75, 0.0, 0.75, 1.5]
            it = itertools.chain([batch], built.data)
            try:
                delta = inferer.compute_attribute_delta(it, num_batches=args.batches)
            except ValueError as e:  # labels without a usable y_classes
                report["manipulate"] = {"error": str(e)}
                delta = None
            if delta is not None:
                Inferer.save_attribute_delta(
                    os.path.join(out_dir, "delta.npz"), delta)
                n_show = min(4, imgs.shape[0])
                report["manipulate"] = {"strengths": strengths,
                                        "num_attributes": int(delta.shape[0])}
                detect = None
                if prof.data.name == "synthetic_attr":
                    from pytorch_glow_tpu.data.synth_attrs import (
                        ATTR_NAMES, measure_attributes)

                    detect, scores = measure_attributes, {}
                for ai in range(min(delta.shape[0], 8)):
                    cols = [inferer.manipulate(imgs[:n_show], delta, ai, s)
                            for s in strengths]
                    grid = np.stack(cols, 1).reshape(-1, *imgs.shape[1:])
                    save_image_grid(
                        os.path.join(out_dir, f"manipulate_attr{ai}.png"),
                        grid, ncol=len(strengths))
                    if detect is not None:
                        base = detect(cols[strengths.index(0.0)])
                        scores[ATTR_NAMES[ai]] = {
                            f"{s:+.2f}": [round(v, 2) for v in
                                          (detect(c) - base).mean(0)]
                            for s, c in zip(strengths, cols)
                        }
                if detect is not None:
                    # scores[attr][strength] = mean detector movement vs s=0
                    # for [bright, red_tint, center_disk] — the target entry
                    # should move ~linearly with s, the others stay near 0.
                    report["manipulate"]["detector_dscore"] = scores

        sums = {"corner": 0.0, "elbo1": 0.0, "iwae8": 0.0}
        count = 0
        it = itertools.chain([batch], built.data)
        for bi, b in enumerate(itertools.islice(it, args.batches)):
            x = np.asarray(b["image"])
            y = _labels_to_onehot(b, prof)
            r = jax.random.fold_in(jax.random.key(args.seed), bi)
            sums["corner"] += float(inferer.nll(x, y).sum())
            sums["elbo1"] += float(
                inferer.nll_bound(x, samples=1, bound="elbo", rng=r, y_onehot=y).sum()
            )
            sums["iwae8"] += float(
                inferer.nll_bound(x, samples=8, bound="iwae", rng=r, y_onehot=y).sum()
            )
            count += x.shape[0]
        report["bits_dim"] = {
            "noise_free_corner": sums["corner"] / count,
            "elbo_1draw": sums["elbo1"] / count,
            "iwae_8draw": sums["iwae8"] / count,
            "eval_images": count,
        }

        if args.swd_images > 0:
            # Multi-scale sliced-Wasserstein between held-out data and
            # T=1.0 samples (the density-matched temperature): the report's
            # sample-quality axis — NLL measures density fit, SWD whether
            # SAMPLES match the data's per-scale patch statistics.
            from pytorch_glow_tpu.utils.swd import sliced_wasserstein

            reals, ylist, got = [], [], 0
            while got < args.swd_images:
                try:
                    b = next(built.data)
                except StopIteration:
                    # Finite (repeat=False) pipeline exhausted — score what
                    # we collected and say so in the report.
                    report["swd_note"] = (
                        f"pipeline exhausted at {got}/{args.swd_images} images"
                    )
                    break
                x = np.asarray(b["image"])
                take = min(args.swd_images - got, x.shape[0])
                reals.append(x[:take])
                y = _labels_to_onehot(b, prof)
                # One entry PER chunk (None when unlabeled) so ylist stays
                # index-aligned with reals even if labeling were mixed.
                ylist.append(np.asarray(y)[:take] if y is not None else None)
                got += take
            fakes = [
                np.asarray(
                    inferer.sample(
                        chunk.shape[0], temperature=1.0,
                        rng=jax.random.fold_in(rng, 1000 + ci),
                        y_onehot=ylist[ci],
                    )
                )
                for ci, chunk in enumerate(reals)
            ]
            if got > 0:
                report["swd_x1e3"] = sliced_wasserstein(
                    np.concatenate(reals), np.concatenate(fakes), seed=args.seed
                )
                report["swd_x1e3"]["images_per_set"] = got

        with open(os.path.join(out_dir, "report.json"), "w") as f:
            json.dump(report, f, indent=2)
        swd_note = (
            f", swd {report['swd_x1e3']['swd_avg']:.1f}x1e-3"
            if "swd_x1e3" in report else ""
        )
        print(
            f"wrote {out_dir}/report.json: step {report['step']}, "
            f"elbo {report['bits_dim']['elbo_1draw']:.4f} bits/dim "
            f"(iwae8 {report['bits_dim']['iwae_8draw']:.4f}), recon drift "
            f"max {report['recon_drift_u8']['max']} bins{swd_note}; "
            f"{2 + len(report['temperatures'])} image sheets"
        )
        return


if __name__ == "__main__":
    main()
