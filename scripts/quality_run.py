"""Scaled quality run: train full PinSage on a MovieLens-1M-shaped synthetic
workload and report HR@k/MRR against random and feature-cosine baselines.

Usage:  python scripts/quality_run.py [--scale small|ml1m] [--epochs N]
Writes results to RESULTS.md (appending a dated section).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="ml1m", choices=["small", "ml1m", "ml25m"])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--max-pairs", type=int, default=50_000,
                    help="positive pairs per epoch (train time is ~3s/50k at "
                         "ml25m scale — coverage is cheap relative to the "
                         "refresh+eval overhead per epoch)")
    ap.add_argument("--refresh-every", type=int, default=1,
                    help="epochs between neighborhood-table refreshes")
    ap.add_argument("--platform", default="default")
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--set", action="append", default=[], dest="overrides",
                    help="dotted config override key=value (repeatable) — "
                         "e.g. --set model.init_style=torch_default for the "
                         "reference-parity ablations")
    ap.add_argument("--tag", default="", help="label appended to the RESULTS "
                                              "section header")
    args = ap.parse_args()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from movie_recommendation_engine_tpu import default_config
    from movie_recommendation_engine_tpu.core.logging import MetricsLogger
    from movie_recommendation_engine_tpu.evaluation import metrics
    from movie_recommendation_engine_tpu.graph import dataset, features as feat
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    cfg = default_config()
    cfg.data.source = "synthetic"
    cfg.data.use_data_subset = False
    if args.scale == "small":
        cfg.data.synthetic_num_movies = 800
        cfg.data.synthetic_num_users = 2000
        cfg.data.synthetic_num_ratings = 100_000
    elif args.scale == "ml1m":  # ~3.7k movies, 6k users, 1M ratings
        cfg.data.synthetic_num_movies = 3700
        cfg.data.synthetic_num_users = 6000
        cfg.data.synthetic_num_ratings = 1_000_000
    else:  # ml25m-shaped: 59k movies, 162k users (hybrid pooling path)
        cfg.data.synthetic_num_movies = 59_000
        cfg.data.synthetic_num_users = 162_000
        cfg.data.synthetic_num_ratings = 8_000_000
    cfg.train.epochs = args.epochs
    cfg.train.max_pairs_per_epoch = args.max_pairs
    cfg.train.refresh_neighborhoods_every = args.refresh_every
    cfg.model.dropout = 0.0
    cfg.eval.eval_every = 1
    cfg.eval.max_val_pairs = 50_000  # full val (379k pairs at ml25m) costs
    # more than the train epoch; final test eval below stays uncapped.
    cfg.eval.patience = args.epochs  # no early stop for the report
    cfg.paths.checkpoint_dir = "/tmp/quality_ck"
    cfg.paths.output_dir = "/tmp/quality_out"
    if args.overrides:
        from movie_recommendation_engine_tpu.cli.main import _parse_overrides

        cfg = cfg.override(_parse_overrides(args.overrides))

    t0 = time.time()
    data = dataset.load(cfg)
    logger = MetricsLogger()
    tr = Trainer(cfg, data, logger)
    print(f"setup {time.time()-t0:.1f}s; device={jax.devices()[0]}", flush=True)

    # Baselines on the test pairs.
    rng = np.random.default_rng(0)
    emb_r = rng.standard_normal((data.num_movies, cfg.model.embed_dim)).astype(np.float32)
    emb_r /= np.linalg.norm(emb_r, axis=1, keepdims=True)
    base_random = metrics.evaluate_embeddings(emb_r, tr.test_pairs,
                                              k_values=cfg.eval.k_values)
    x = np.asarray(tr.x_table[: data.num_movies])
    xn = x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-9)
    base_feat = metrics.evaluate_embeddings(xn, tr.test_pairs,
                                            k_values=cfg.eval.k_values)

    t0 = time.time()
    fit = tr.fit()
    train_s = time.time() - t0
    # Report the validation-selected best checkpoint when one exists (fit
    # saves it by val HR@k); falling back to last-epoch params otherwise.
    # fit() sets best_path only when THIS run wrote best_model (guards
    # against a stale checkpoint from an earlier run in the shared /tmp dir,
    # including future resume_from runs that restore best_metric > -inf).
    best = fit.get("best_path")
    if best and os.path.exists(best + ".npz"):
        tr.load_checkpoint(best)
        print("evaluating best_model checkpoint "
              f"(epoch {tr.epoch}, val {tr.best_metric:.4f})", flush=True)
    final = tr.evaluate()

    throughput = [h["examples_per_sec"] for h in fit["history"]]
    report = {
        "scale": args.scale,
        "device": str(jax.devices()[0]),
        "num_movies": data.num_movies,
        "num_users": data.num_users,
        "num_ratings": data.num_interactions,
        "train_pairs": int(tr.train_pairs.shape[0]),
        "test_pairs": int(tr.test_pairs.shape[0]),
        "epochs": args.epochs,
        "train_seconds": round(train_s, 1),
        "examples_per_sec_median": float(np.nanmedian(throughput)),
        "random": base_random,
        "feature_cosine": base_feat,
        "trained": final,
        "overrides": args.overrides,
    }
    print(json.dumps(report, indent=2, default=float))
    with open(args.out, "a") as f:
        tag = f", {args.tag}" if args.tag else ""
        f.write(f"\n## Quality run — {time.strftime('%Y-%m-%d %H:%M')} "
                f"({args.scale}{tag}, {report['device']})\n\n")
        if args.overrides:
            f.write(f"- overrides: `{' '.join(args.overrides)}`\n")
        f.write(f"- corpus: {report['num_movies']} movies / "
                f"{report['num_users']} users / {report['num_ratings']} ratings; "
                f"{report['train_pairs']} train pairs, {report['test_pairs']} test pairs\n")
        f.write(f"- {args.epochs} epochs in {report['train_seconds']}s "
                f"(median {report['examples_per_sec_median']:.0f} examples/s)\n\n")
        f.write("| metric | random | feature cosine | trained PinSage |\n|---|---|---|---|\n")
        for k in ("hit_rate@10", "hit_rate@50", "hit_rate@100", "hit_rate@500",
                  "mrr", "mrr_standard"):
            f.write(f"| {k} | {base_random[k]:.4f} | {base_feat[k]:.4f} | "
                    f"{final[k]:.4f} |\n")
    print(f"appended to {args.out}")


if __name__ == "__main__":
    main()
