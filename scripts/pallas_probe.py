"""One-shot probe: do the Pallas kernels compile/run on the REAL chip?

Round-1 finding (CLAUDE.md): Pallas kernels hang/413 through the tunnel's
remote-compile, so production gates them off on the axon backend and tests
run interpret mode. This probe retries that finding cheaply and records the
outcome: one tiny gather_pool call and one tiny hamming_topk call, each
wrapped in wall-clock timing and a hard np.asarray sync. Run it LAST in a
TPU session (it may hang until its timeout — schedule nothing after it).

Usage: timeout 900 python scripts/pallas_probe.py [--skip-hamming]
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
    ap.add_argument("--rows", type=int, default=1024)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--k", type=int, default=16)
    ap.add_argument("--skip-hamming", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"device={jax.devices()[0]}", flush=True)
    rng = np.random.default_rng(0)

    from movie_recommendation_engine_tpu.ops.pallas.pool import gather_pool

    table = jnp.asarray(rng.standard_normal((args.rows, args.dim)), jnp.float32)
    nbrs = jnp.asarray(rng.integers(0, args.rows, (args.batch, args.k)), jnp.int32)
    w = jnp.asarray(rng.random((args.batch, args.k)), jnp.float32)

    print("[probe] compiling gather_pool on the real chip ...", flush=True)
    t0 = time.perf_counter()
    out = gather_pool(table, nbrs, w, valid_limit=args.rows)
    out_np = np.asarray(out)  # hard sync
    t_compile = time.perf_counter() - t0
    ref = np.asarray(jnp.einsum("bk,bkd->bd", w, jnp.take(table, nbrs, axis=0)))
    err = float(np.abs(out_np - ref).max())
    t0 = time.perf_counter()
    np.asarray(gather_pool(table, nbrs, w, valid_limit=args.rows))
    t_run = time.perf_counter() - t0
    print(json.dumps({
        "kernel": "gather_pool", "compile_s": round(t_compile, 1),
        "steady_s": round(t_run, 4), "max_abs_err": err,
        "ok": err < 1e-3,
    }), flush=True)

    if not args.skip_hamming:
        from movie_recommendation_engine_tpu.ops.pallas.hamming import hamming_topk

        words = 8  # 256 bits / 32
        tables = 2
        sigs = jnp.asarray(
            rng.integers(0, 2**32, (args.rows, tables * words), dtype=np.uint64)
            .astype(np.uint32))
        qs = sigs[: args.batch]
        print("[probe] compiling hamming_topk on the real chip ...", flush=True)
        t0 = time.perf_counter()
        d, i = hamming_topk(qs, sigs, k=args.k, num_tables=tables, words=words)
        np.asarray(d); np.asarray(i)
        ok = bool((np.asarray(i)[:, 0] == np.arange(args.batch)).all())
        print(json.dumps({
            "kernel": "hamming_topk",
            "compile_s": round(time.perf_counter() - t0, 1),
            "self_match_top1": ok, "ok": ok,
        }), flush=True)


if __name__ == "__main__":
    main()
