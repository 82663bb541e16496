"""Full-corpus retrieval latency/recall probe at ML-25M scale (59k items).

Measures the BASELINE.md headline target — sub-ms p50 LSH retrieval over the
full item corpus — plus exact and IVF, via the same harness the `benchmark`
CLI mode uses (retrieval/bench.py). Embedding provenance doesn't affect
latency; unit-norm random embeddings keep the probe self-contained.

Usage: python scripts/retrieval59k_bench.py [--items 59000] [--queries 256]
Run on the TPU (one process; see CLAUDE.md claim discipline).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=59_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--platform", default="default")
    args = ap.parse_args()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from movie_recommendation_engine_tpu.retrieval.bench import (
        benchmark_search_methods, print_benchmark,
    )

    rng = np.random.default_rng(0)
    # Cluster-structured embeddings (centers + noise), matching the geometry
    # of trained L2-normalized item embeddings — uniform-random points are
    # near-orthogonal and make ANN recall look artificially poor.
    centers = rng.standard_normal((max(args.items // 120, 8), args.dim))
    assign = rng.integers(0, centers.shape[0], args.items)
    emb = (centers[assign] + 0.35 * rng.standard_normal((args.items, args.dim)))
    emb = (emb / np.linalg.norm(emb, axis=1, keepdims=True)).astype(np.float32)
    q = emb[rng.choice(args.items, args.queries, replace=False)]

    print(f"device={jax.devices()[0]}; corpus {args.items}x{args.dim}, "
          f"{args.queries} queries, k={args.k}", flush=True)
    results = benchmark_search_methods(emb, q, k=args.k, repeats=args.repeats)
    print_benchmark(results, k=args.k)
    for method, r in results.items():
        print(json.dumps({
            "method": method,
            **{kk: round(float(vv), 4) for kk, vv in r.items()
               if isinstance(vv, (int, float))},
        }), flush=True)


if __name__ == "__main__":
    main()
