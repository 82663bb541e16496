"""Export the synthetic workload as MovieLens-format CSVs.

Writes movies.csv / ratings.csv / tags.csv / links.csv exactly as the real
ML-25M distribution lays them out (reference download_dataset.py:75-105
verifies these four files), so BOTH pipelines — the actual reference code at
/root/reference and this framework (data.source=movielens) — can ingest the
IDENTICAL files for the ground-truth baseline comparison (BASELINE.md).

Usage: python scripts/export_movielens_csvs.py --scale ml100k|ml1m|ml25m --out DIR
"""

from __future__ import annotations

import argparse
import csv
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SCALES = {
    # (num_movies, num_users, num_rating_draws) — draws dedup to ~1/3.
    "ml100k": (800, 2000, 100_000),
    "ml1m": (3700, 6000, 1_000_000),
    # Mid-scale rung for the ground-truth side-by-side (VERDICT r2 #4): the
    # largest corpus the reference's Python loops complete in tractable CPU
    # time on this 2-vCPU host (ml25m-scale was impractical there).
    "ml10m": (16_000, 48_000, 3_000_000),
    "ml25m": (59_000, 162_000, 8_000_000),
}


def export(scale: str, out_dir: str, seed: int = 42) -> None:
    from movie_recommendation_engine_tpu.graph import synthetic

    m, u, r = SCALES[scale]
    raw = synthetic.generate(num_movies=m, num_users=u, num_ratings=r, seed=seed)
    os.makedirs(out_dir, exist_ok=True)

    with open(os.path.join(out_dir, "movies.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["movieId", "title", "genres"])
        for mid, title, genre in zip(raw["movie_ids"], raw["titles"], raw["genres"]):
            w.writerow([int(mid), title, genre])

    with open(os.path.join(out_dir, "ratings.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["userId", "movieId", "rating", "timestamp"])
        for uid, mid, val, ts in zip(
            raw["rating_user_ids"], raw["rating_movie_ids"],
            raw["rating_values"], raw["rating_timestamps"],
        ):
            # MovieLens writes half-step ratings as e.g. "3.5" / "4.0".
            w.writerow([int(uid), int(mid), f"{float(val):g}", int(ts)])

    with open(os.path.join(out_dir, "tags.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["userId", "movieId", "tag", "timestamp"])
        if "tag_movie_ids" in raw:
            for uid, mid, tag in zip(
                raw["tag_user_ids"], raw["tag_movie_ids"], raw["tag_values"]
            ):
                w.writerow([int(uid), int(mid), str(tag), 1_000_000_000])

    with open(os.path.join(out_dir, "links.csv"), "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["movieId", "imdbId", "tmdbId"])
        for i, mid in enumerate(raw["movie_ids"]):
            w.writerow([int(mid), 100000 + i, 200000 + i])

    n = len(raw["rating_user_ids"])
    print(f"exported {scale}: {m} movies, {u} users, {n} ratings -> {out_dir}")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="ml1m", choices=sorted(SCALES))
    ap.add_argument("--out", required=True)
    ap.add_argument("--seed", type=int, default=42)
    args = ap.parse_args()
    export(args.scale, args.out, args.seed)
