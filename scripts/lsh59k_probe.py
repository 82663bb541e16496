"""Diagnose which full-corpus (59k) LSH scoring program the axon tunnel's
remote compiler accepts. One VARIANT per process invocation (a wedged sync
cannot be interrupted in-process — the parent runs each variant under its
own `timeout`):

    timeout 700 python scripts/lsh59k_probe.py --variant fused
    timeout 700 python scripts/lsh59k_probe.py --variant unroll
    ... (scan | einsum | popcount)

Variants score Q=256 queries against N items (min Hamming over T=16 tables
of B=256 bits) and top-k:
  fused    — the PRODUCTION search program (LSHIndex matmul impl): in-program
             projection -> sign -> unrolled per-table dots -> top_k
  unroll   — pre-signed +-1 queries, same unrolled dots (the fused program
             minus the projection prologue)
  scan     — lax.scan over tables of one [Q,B]x[B,N] matmul
  einsum   — "tqb,tnb->qnt" batched form ([Q,N,T] f32 intermediate)
  popcount — packed uint32 XOR + population_count chunk-scan

History: the round-2 full-corpus wedges first blamed on einsum/scan were
actually the mis-gated Pallas path (core/backend.py); scan/einsum tunnel
behavior is UNKNOWN, not proven-bad. Prints one JSON line per run: variant,
compile+first-run seconds, steady seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", required=True,
                    choices=["fused", "scan", "unroll", "einsum", "popcount"])
    ap.add_argument("--items", type=int, default=59_000)
    ap.add_argument("--queries", type=int, default=256)
    ap.add_argument("--tables", type=int, default=16)
    ap.add_argument("--bits", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--platform", default="default")
    args = ap.parse_args()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax
    import jax.numpy as jnp

    print(f"device={jax.devices()[0]} variant={args.variant}", flush=True)
    rng = np.random.default_rng(0)
    t, b, n, q, k = args.tables, args.bits, args.items, args.queries, args.k

    if args.variant == "fused":
        # The real production path: build the index, search through it.
        from movie_recommendation_engine_tpu.retrieval.lsh import LSHIndex

        emb = rng.standard_normal((n, 128)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        index = LSHIndex(128, num_bits=b, num_tables=t,
                         hamming_impl="matmul", use_pallas=False)
        index.build(emb)
        qv = jnp.asarray(emb[:q])
        fn = lambda: index.search(qv, k)
    elif args.variant == "popcount":
        from movie_recommendation_engine_tpu.retrieval.lsh import _hamming_topk

        w = b // 32
        sigs = jnp.asarray(rng.integers(0, 2**32, (n, t, w), dtype=np.uint64)
                           .astype(np.uint32))
        qsig = sigs[:q]
        fn = lambda: _hamming_topk(qsig, sigs, k)
    else:
        sigs_pm = jnp.asarray(
            rng.integers(0, 2, (t, n, b)).astype(np.float32) * 2 - 1,
            jnp.bfloat16)
        qs_pm = sigs_pm[:, :q, :]

        if args.variant == "scan":
            @partial(jax.jit, static_argnames=("k",))
            def scan_form(qsig_pm, sigs_pm, k):
                def body(best, ts):
                    qs, ss = ts
                    ip = jnp.dot(qs, ss.T,
                                 preferred_element_type=jnp.float32)
                    return jnp.maximum(best, ip), None

                init = jnp.full((qsig_pm.shape[1], sigs_pm.shape[1]),
                                -jnp.inf, jnp.float32)
                best, _ = jax.lax.scan(body, init, (qsig_pm, sigs_pm))
                dist = (qsig_pm.shape[-1] - best) * 0.5
                neg, idx = jax.lax.top_k(-dist, k)
                return (-neg).astype(jnp.int32), idx

            fn = lambda: scan_form(qs_pm, sigs_pm, k)
        elif args.variant == "unroll":
            from movie_recommendation_engine_tpu.retrieval.lsh import (
                _hamming_topk_matmul,
            )

            fn = lambda: _hamming_topk_matmul(qs_pm, sigs_pm, k)
        else:  # einsum
            @partial(jax.jit, static_argnames=("k",))
            def einsum_form(qsig_pm, sigs_pm, k):
                ip = jnp.einsum("tqb,tnb->qnt", qsig_pm, sigs_pm,
                                preferred_element_type=jnp.float32)
                dist = (qsig_pm.shape[-1] - jnp.max(ip, axis=-1)) * 0.5
                neg, idx = jax.lax.top_k(-dist, k)
                return (-neg).astype(jnp.int32), idx

            fn = lambda: einsum_form(qs_pm, sigs_pm, k)

    t0 = time.perf_counter()
    d, i = fn()
    np.asarray(d); np.asarray(i)  # hard sync (CLAUDE.md)
    t_first = time.perf_counter() - t0
    t0 = time.perf_counter()
    d, i = fn()
    np.asarray(d); np.asarray(i)
    t_steady = time.perf_counter() - t0
    ok = bool((np.asarray(i)[:, 0] == np.arange(q)).all())  # self top-1
    print(json.dumps({
        "variant": args.variant, "first_s": round(t_first, 1),
        "steady_s": round(t_steady, 4),
        "per_query_ms": round(t_steady / q * 1e3, 4),
        "self_match_top1": ok,
    }), flush=True)


if __name__ == "__main__":
    main()
