"""Run the ACTUAL reference code (/root/reference) on exported CSVs.

This is the ground-truth baseline deliverable (BASELINE.md, SURVEY.md §6):
execute the reference's own pipeline — run.py:process_data -> train_model
(train.py:8-124) -> evaluate_model_actual_interactions (run.py:142-252,
utils/evaluation.py:75-104) — unmodified, on CPU, against the same
MovieLens-format CSVs this framework trains on (scripts/export_movielens_csvs.py).

Only two things are shimmed so imports resolve in this no-pip environment
(scripts/refcompat: torch_geometric + faiss — see its README); every measured
line is reference code. The driver replicates run.py:main's orchestration
(seed, bounds-filtering at run.py:531-545) and times the train() call.

Usage:
  python scripts/reference_rerun.py --data-dir /tmp/mlcsv_ml1m \
      --workdir /tmp/ref_run_ml1m [--epochs 10] [--out ref_results.json]

Outputs a JSON summary line (metrics + timings) and saves the reference's
embeddings + movieId mapping into the workdir for cross-harness evaluation
(scripts/side_by_side_eval.py).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REF = "/root/reference"
COMPAT = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refcompat")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--workdir", required=True,
                    help="scratch cwd (reference config.py creates "
                         "./checkpoints ./output relative to it)")
    ap.add_argument("--epochs", type=int, default=None,
                    help="override config.EPOCHS (default: reference's 10)")
    ap.add_argument("--out", default=None, help="also write JSON here")
    args = ap.parse_args()

    os.makedirs(args.workdir, exist_ok=True)
    os.chdir(args.workdir)
    sys.path.insert(0, COMPAT)
    sys.path.insert(0, REF)

    import numpy as np
    import torch

    import config as ref_config  # /root/reference/config.py

    ref_config.DATA_DIR = args.data_dir
    if args.epochs is not None:
        ref_config.EPOCHS = args.epochs

    # torch-version compat: the reference targets torch==2.0.1
    # (requirements.txt:8) and passes verbose= to ReduceLROnPlateau
    # (run.py:120-122); torch 2.13 (this box) removed that kwarg. Accept and
    # drop it — scheduler math is unchanged.
    _Plateau = torch.optim.lr_scheduler.ReduceLROnPlateau

    class _CompatPlateau(_Plateau):
        def __init__(self, *a, verbose=None, **k):
            super().__init__(*a, **k)

    torch.optim.lr_scheduler.ReduceLROnPlateau = _CompatPlateau

    import run as ref_run  # /root/reference/run.py
    import train as ref_train  # /root/reference/train.py

    # Time the train() call itself (the examples/s the TPU bench compares
    # against); train_model's `from train import train` resolves through
    # sys.modules, so wrapping here is transparent.
    timing = {}
    orig_train = ref_train.train

    def timed_train(*a, **k):
        t0 = time.perf_counter()
        out = orig_train(*a, **k)
        timing["train_seconds"] = time.perf_counter() - t0
        return out

    ref_train.train = timed_train

    ref_run.set_seed(42)  # run.py:514

    t0 = time.perf_counter()
    (dataset, edge_index, edge_weights, movie_features,
     train_data, val_data, test_data) = ref_run.process_data()
    timing["process_data_seconds"] = time.perf_counter() - t0

    # Bounds-filtering exactly as run.py:531-545.
    train_positive_pairs = train_data["positive_pairs"]
    valid_mask = train_positive_pairs[:, 1] < len(movie_features)
    train_data["positive_pairs"] = train_positive_pairs[valid_mask]
    val_positive_pairs = val_data["positive_pairs"]
    valid_val_mask = val_positive_pairs[:, 1] < len(movie_features)
    val_data["positive_pairs"] = val_positive_pairs[valid_val_mask]

    model, checkpoint, _sampler = ref_run.train_model(
        dataset, edge_index, edge_weights, movie_features,
        train_data, val_data, test_data,
    )

    t0 = time.perf_counter()
    embeddings, results = ref_run.evaluate_model_actual_interactions(
        model, movie_features, dataset, test_data,
    )
    timing["evaluate_seconds"] = time.perf_counter() - t0

    # Examples/s over the timed train() call: the loop trains
    # min(1000, pairs) examples per epoch (train.py:40-43).
    epochs_run = int(checkpoint["epoch"]) + 1
    per_epoch = min(1000, len(train_data["positive_pairs"]))
    examples = epochs_run * per_epoch
    exps = examples / timing["train_seconds"] if timing.get("train_seconds") else None

    # Save embeddings + movieId mapping for the cross-harness comparison.
    emb_np = embeddings.detach().cpu().numpy()
    np.save(os.path.join(args.workdir, "ref_embeddings.npy"), emb_np)
    mids = np.array(
        [dataset.idx_to_movie_id[i] for i in range(len(dataset.movie_id_to_idx))],
        dtype=np.int64,
    )
    np.save(os.path.join(args.workdir, "ref_movie_ids.npy"), mids)

    summary = {
        "pipeline": "reference (/root/reference, actual code, CPU)",
        "data_dir": args.data_dir,
        "num_movies_mapped": len(dataset.movie_id_to_idx),
        "num_users_mapped": len(dataset.user_id_to_idx),
        "num_ratings_after_subsample": int(len(dataset.ratings_df)),
        "epochs_run": epochs_run,
        "train_examples_total": examples,
        "train_seconds": round(timing.get("train_seconds", float("nan")), 2),
        "examples_per_sec": round(exps, 2) if exps else None,
        "process_data_seconds": round(timing["process_data_seconds"], 2),
        "evaluate_seconds": round(timing["evaluate_seconds"], 2),
        "metrics": {k: float(v) for k, v in results.items()},
        "torch_threads": torch.get_num_threads(),
    }
    line = json.dumps(summary)
    print(line, flush=True)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
