"""Side-by-side quality: reference embeddings vs this framework, ONE harness.

Protocol (BASELINE.md ground-truth deliverable):
1. `scripts/export_movielens_csvs.py` wrote MovieLens-format CSVs.
2. `scripts/reference_rerun.py` ran the ACTUAL reference code on them and
   saved its embeddings + movieId map (ref_embeddings.npy / ref_movie_ids.npy).
3. This script trains THIS framework on the SAME CSVs with the SAME effective
   data pipeline (30% ratings subsample — run.py:48) and the SAME training
   budget (<=1000 pairs/epoch x EPOCHS — train.py:40-43), twice:
   - train_path=mlp (the reference's shipped loop, engine-parity mode)
   - train_path=pinsage (the documented design: graph forward + NCE)
   then evaluates ALL THREE embedding tables with one harness
   (evaluation/metrics.py) on identical held-out test pairs (our temporal
   test split, co-rated >= 4.0), aligned across index spaces via raw movieId.

The reference's own self-reported metrics (its evaluation code, its pairs)
are captured separately by reference_rerun.py; this script is the
apples-to-apples comparison on one metric implementation + one pair set.

Usage: python scripts/side_by_side_eval.py --data-dir /tmp/mlcsv_ml1m \
           --ref-workdir /tmp/ref_run_ml1m [--platform cpu] [--epochs 10]
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
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--ref-workdir", required=True)
    ap.add_argument("--platform", default="default")
    ap.add_argument("--epochs", type=int, default=10)
    ap.add_argument("--budget-pairs", type=int, default=1000,
                    help="max positive pairs per epoch (reference: 1000)")
    ap.add_argument("--subset", type=float, default=0.30,
                    help="ratings subsample fraction (reference run.py:48)")
    ap.add_argument("--out", default=None, help="write the JSON report here")
    ap.add_argument("--pool-impl", default="auto",
                    help="model.pool_impl override. The quality outcome is "
                         "pooling-form-independent (forms are numerically "
                         "identical, tests); 'gather' avoids materializing "
                         "the [N, N] hybrid matrix when scoring large "
                         "corpora on the CPU backend")
    args = ap.parse_args()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from movie_recommendation_engine_tpu import default_config
    from movie_recommendation_engine_tpu.core.logging import MetricsLogger
    from movie_recommendation_engine_tpu.evaluation import metrics
    from movie_recommendation_engine_tpu.graph import dataset as ds
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    ref_emb = np.load(os.path.join(args.ref_workdir, "ref_embeddings.npy"))
    ref_mids = np.load(os.path.join(args.ref_workdir, "ref_movie_ids.npy"))
    ref_lut = {int(m): i for i, m in enumerate(ref_mids)}

    base = default_config()
    base.data.source = "movielens"
    base.data.data_dir = args.data_dir
    base.data.use_data_subset = args.subset < 1.0
    base.data.data_subset_fraction = args.subset
    base.train.epochs = args.epochs
    base.train.max_pairs_per_epoch = args.budget_pairs
    base.model.pool_impl = args.pool_impl
    base.eval.patience = args.epochs  # no early stop: fixed budget
    base.paths.checkpoint_dir = "/tmp/sbs_ck"
    base.paths.output_dir = "/tmp/sbs_out"

    data = ds.load(base)
    print(f"corpus: {data.num_movies} movies / {data.num_users} users / "
          f"{data.num_interactions} ratings; device={jax.devices()[0]}",
          flush=True)

    # Align the reference table to OUR index space via raw movieId. Our
    # corpus (post-subsample) is a subset of the reference's map (built
    # pre-subsample from the same filtered ratings), so every id resolves;
    # assert rather than silently drop.
    ref_rows = np.array([ref_lut[int(m)] for m in data.movie_ids], dtype=np.int64)
    ref_emb_aligned = ref_emb[ref_rows]

    report = {
        "data_dir": args.data_dir,
        "device": str(jax.devices()[0]),
        "num_movies": data.num_movies,
        "num_users": data.num_users,
        "num_ratings": data.num_interactions,
        "epochs": args.epochs,
        "budget_pairs_per_epoch": args.budget_pairs,
        "subset_fraction": args.subset,
        "variants": {},
    }

    test_pairs = None
    for variant in ("mlp", "pinsage"):
        cfg = base.override({"train.train_path": variant}) \
            if variant != "pinsage" else base
        cfg.paths.checkpoint_dir = f"/tmp/sbs_ck_{variant}"
        tr = Trainer(cfg, data, MetricsLogger())
        if test_pairs is None:
            test_pairs = tr.test_pairs  # identical across variants (same
            # split + seed); also the pair set used for the reference table.
        t0 = time.time()
        fit = tr.fit()
        train_s = time.time() - t0
        emb = np.asarray(tr.movie_embeddings())
        res = metrics.evaluate_embeddings(emb, test_pairs,
                                          k_values=cfg.eval.k_values)
        thr = [h["examples_per_sec"] for h in fit["history"]]
        report["variants"][f"ours_{variant}"] = {
            "metrics": res,
            "train_seconds": round(train_s, 1),
            "examples_per_sec_median": float(np.nanmedian(thr)),
        }
        print(f"ours_{variant}: {json.dumps(res)}", flush=True)

    res_ref = metrics.evaluate_embeddings(ref_emb_aligned, test_pairs,
                                          k_values=base.eval.k_values)
    report["variants"]["reference_actual_code"] = {"metrics": res_ref}
    report["num_test_pairs"] = int(test_pairs.shape[0])
    print(f"reference: {json.dumps(res_ref)}", flush=True)

    line = json.dumps(report, default=float)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
