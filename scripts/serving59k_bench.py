"""ML-25M-scale serving benchmark: index latency/recall AND end-to-end
batched-server latency under concurrent load, in ONE process (TPU claim
discipline — CLAUDE.md).

Part 1 mirrors scripts/retrieval59k_bench.py: exact/LSH/IVF latency + recall
over a 59k-item corpus via retrieval/bench.benchmark_search_methods.

Part 2 drives retrieval/server.BatchingRecommender the way production
traffic would: T closed-loop client threads issuing random item queries for
D seconds. Reports completed QPS and client-observed p50/p95/p99 (submit ->
result, which hard-syncs via np.asarray in the worker), plus the server's
own batching stats.

Usage: python scripts/serving59k_bench.py [--items 59000] [--seconds 20]
                                          [--clients 1 8 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import threading
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def clustered_embeddings(rng, items, dim):
    """Cluster-structured unit-norm embeddings (see retrieval59k_bench.py —
    uniform-random points are near-orthogonal and distort ANN recall)."""
    centers = rng.standard_normal((max(items // 120, 8), dim))
    assign = rng.integers(0, centers.shape[0], items)
    emb = centers[assign] + 0.35 * rng.standard_normal((items, dim))
    emb /= np.linalg.norm(emb, axis=1, keepdims=True)
    return emb.astype(np.float32)


def load_test(rec, num_clients: int, seconds: float, k: int):
    """Closed-loop load: each client issues its next query as soon as the
    previous one resolves. Server stats are reset first so each concurrency
    level reports its own batching behavior (not a cumulative mix)."""
    rec.reset_stats()
    latencies: list[list[float]] = [[] for _ in range(num_clients)]
    stop = time.perf_counter() + seconds
    n = rec.ntotal

    def client(ci):
        r = np.random.default_rng(1000 + ci)
        while time.perf_counter() < stop:
            i = int(r.integers(0, n))
            t0 = time.perf_counter()
            rec.recommend_by_item(i, k=k)
            latencies[ci].append(time.perf_counter() - t0)

    threads = [threading.Thread(target=client, args=(c,))
               for c in range(num_clients)]
    t_start = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t_start
    lat = np.asarray([x for l in latencies for x in l]) * 1e3
    if lat.size == 0:  # window too short for any request to complete
        return {"clients": num_clients, "requests": 0, "qps": 0.0,
                "server": rec.stats()}
    return {
        "clients": num_clients,
        "requests": int(lat.size),
        "qps": round(lat.size / wall, 1),
        "latency_ms_p50": round(float(np.percentile(lat, 50)), 3),
        "latency_ms_p95": round(float(np.percentile(lat, 95)), 3),
        "latency_ms_p99": round(float(np.percentile(lat, 99)), 3),
        "server": rec.stats(),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--items", type=int, default=59_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--seconds", type=float, default=20.0)
    ap.add_argument("--clients", type=int, nargs="+", default=[1, 8, 64])
    ap.add_argument("--methods", nargs="+", default=["exact", "lsh"])
    ap.add_argument("--index-methods", nargs="+",
                    default=["exact", "lsh", "ivf"],
                    help="index-level bench methods (exact must be first "
                         "for recall)")
    ap.add_argument("--max-batch", type=int, default=64)
    ap.add_argument("--skip-index-bench", action="store_true")
    ap.add_argument("--lsh-rerank", type=int, default=0,
                    help="re-score this many min-Hamming candidates with "
                         "exact dots (search.lsh_rerank); 0 = plain Hamming")
    ap.add_argument("--platform", default="default")
    args = ap.parse_args()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from movie_recommendation_engine_tpu.retrieval.bench import (
        benchmark_search_methods, print_benchmark,
    )
    from movie_recommendation_engine_tpu.retrieval.server import (
        BatchingRecommender,
    )

    cfg = None
    if args.lsh_rerank:
        from movie_recommendation_engine_tpu import default_config

        cfg = default_config()
        cfg.search.lsh_rerank = args.lsh_rerank

    rng = np.random.default_rng(0)
    emb = clustered_embeddings(rng, args.items, args.dim)
    print(f"device={jax.devices()[0]} corpus={args.items}x{args.dim}"
          f" lsh_rerank={args.lsh_rerank}", flush=True)

    if not args.skip_index_bench:
        q = emb[rng.choice(args.items, args.queries, replace=False)]
        results = benchmark_search_methods(emb, q, k=args.k,
                                           methods=args.index_methods,
                                           cfg=cfg)
        print_benchmark(results, k=args.k)
        summary = {
            m: {
                "p50_ms_per_query": round(r["p50_search_time_per_query_ms"], 4),
                "best_ms_per_query": round(r["search_time_per_query_ms"], 4),
                **({"recall": round(r["recall"], 4)} if "recall" in r else {}),
            }
            for m, r in results.items()
        }
        print("INDEX " + json.dumps(summary), flush=True)

    for method in args.methods:
        print(f"\n== server load test: {method} ==", flush=True)
        t0 = time.perf_counter()
        rec = BatchingRecommender(emb, method=method, cfg=cfg,
                                  max_batch=args.max_batch, max_wait_ms=2.0,
                                  max_k=max(args.k, 10))
        print(f"build+warmup {time.perf_counter() - t0:.1f}s", flush=True)
        for c in args.clients:
            out = load_test(rec, c, args.seconds, args.k)
            print("SERVE " + json.dumps({"method": method, **out}), flush=True)
        rec.close()


if __name__ == "__main__":
    main()
