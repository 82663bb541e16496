"""Parity-mode ablation: quantify each deliberate deviation from the
reference recipe on the ml1m-scale synthetic workload, in ONE process
(TPU claim discipline — CLAUDE.md).

The framework's defaults deviate from the reference
(`/root/reference/config.py`, `model/pinsage.py`, `model/loss.py`) in three
config-selectable ways (CLAUDE.md "Design invariants"):
  - model.init_style   he_zero_bias   vs reference torch_default
  - features.standardize false        vs reference true (StandardScaler+PCA,
                                      data/feature_extractor.py:94-100)
  - train.loss         nce            vs reference curriculum
                                      (model/loss.py:115-176)

This script trains one model per variant (defaults, each deviation reverted
individually, and the full reference recipe) on identical data/seeds and
appends a single comparison table to RESULTS.md — making the "reference
recipe collapses, the deviations are justified" claim reproducible from
committed numbers rather than commit-history archaeology (VERDICT.md weak #5).

Usage: python scripts/parity_ablation.py [--epochs 10] [--scale ml1m]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# NOTE: standardize only matters when PCA actually runs (raw feature width >
# feature_dim). The ml1m-scale synthetic corpus has raw width 95, so the
# standardize arms pin feature_dim=64 on BOTH sides for an apples-to-apples
# PCA-active comparison; the other variants keep the default 128 (PCA off,
# matching the recorded quality runs).
VARIANTS = [
    ("defaults", []),
    ("init=torch_default", ["model.init_style=torch_default"]),
    ("pca64 center-only", ["features.feature_dim=64"]),
    ("pca64 standardize=true", ["features.feature_dim=64",
                                "features.standardize=true"]),
    ("loss=curriculum", ["train.loss=curriculum"]),
    # feature_dim=64 here too: without it standardize=true is a silent no-op
    # (PCA never runs at raw width 95), and the "full recipe" row would
    # really be only init+curriculum.
    ("full reference recipe", [
        "model.init_style=torch_default",
        "features.feature_dim=64",
        "features.standardize=true",
        "train.loss=curriculum",
    ]),
]


def build_cfg(args, overrides):
    from movie_recommendation_engine_tpu import default_config
    from movie_recommendation_engine_tpu.cli.main import _parse_overrides

    cfg = default_config()
    cfg.data.source = "synthetic"
    cfg.data.use_data_subset = False
    if args.scale == "ml1m":
        cfg.data.synthetic_num_movies = 3700
        cfg.data.synthetic_num_users = 6000
        cfg.data.synthetic_num_ratings = 1_000_000
    else:  # small
        cfg.data.synthetic_num_movies = 800
        cfg.data.synthetic_num_users = 2000
        cfg.data.synthetic_num_ratings = 100_000
    cfg.train.epochs = args.epochs
    cfg.train.max_pairs_per_epoch = args.max_pairs
    cfg.model.dropout = 0.0
    cfg.eval.eval_every = 1
    cfg.eval.max_val_pairs = 50_000
    cfg.eval.patience = args.epochs  # no early stop: report the full budget
    cfg.paths.checkpoint_dir = "/tmp/ablation_ck"
    cfg.paths.output_dir = "/tmp/ablation_out"
    if overrides:
        cfg = cfg.override(_parse_overrides(overrides))
    return cfg


def run_variant(args, tag, overrides):
    from movie_recommendation_engine_tpu.core.logging import MetricsLogger
    from movie_recommendation_engine_tpu.graph import dataset
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    cfg = build_cfg(args, overrides)
    t0 = time.time()
    data = dataset.load(cfg)  # standardize affects features → reload per variant
    tr = Trainer(cfg, data, MetricsLogger())
    print(f"[{tag}] setup {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    fit = tr.fit()
    train_s = time.time() - t0
    best = fit.get("best_path")
    if best and os.path.exists(best + ".npz"):
        tr.load_checkpoint(best)
    final = tr.evaluate()
    final["train_seconds"] = round(train_s, 1)
    print(f"[{tag}] " + json.dumps(final, default=float), flush=True)
    return final


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="ml1m", choices=["small", "ml1m"])
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--max-pairs", type=int, default=50_000)
    ap.add_argument("--platform", default="default")
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--variants", default="",
                    help="comma list of variant tags to run (default: all). "
                         "Lets a follow-up TPU run fill in missing arms "
                         "without re-paying the full queue.")
    args = ap.parse_args()

    variants = VARIANTS
    if args.variants:
        wanted = [v.strip() for v in args.variants.split(",") if v.strip()]
        unknown = set(wanted) - {tag for tag, _ in VARIANTS}
        if unknown:
            raise SystemExit(f"unknown variants: {sorted(unknown)}")
        variants = [(tag, ovr) for tag, ovr in VARIANTS if tag in wanted]

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    print(f"device={jax.devices()[0]}", flush=True)
    results = {}
    for tag, ovr in variants:
        try:
            results[tag] = run_variant(args, tag, ovr)
        except Exception as e:  # one collapsed variant must not sink the rest
            print(f"[{tag}] FAILED: {e}", flush=True)
            results[tag] = {"error": str(e)}

    keys = ("hit_rate@10", "hit_rate@50", "hit_rate@100", "hit_rate@500",
            "mrr", "mrr_standard")
    with open(args.out, "a") as f:
        f.write(f"\n## Parity-mode ablation — {time.strftime('%Y-%m-%d %H:%M')}"
                f" ({args.scale}, {args.epochs} epochs, {jax.devices()[0]})\n\n")
        f.write("Each deliberate deviation from the reference recipe reverted "
                "individually (identical data/seed/budget; test-pair eval):\n\n")
        f.write("| variant | " + " | ".join(keys) + " |\n")
        f.write("|---|" + "---|" * len(keys) + "\n")
        for tag, _ in variants:
            r = results[tag]
            if "error" in r:
                f.write(f"| {tag} | failed: {r['error']} " + "| " * (len(keys) - 1) + "|\n")
            else:
                f.write(f"| {tag} | " +
                        " | ".join(f"{r[k]:.4f}" for k in keys) + " |\n")
    print(f"appended to {args.out}", flush=True)


if __name__ == "__main__":
    main()
