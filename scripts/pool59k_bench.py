"""A/B step-time benchmark at ML-25M scale (59k movies): hybrid dense-MXU
pooling vs the gather form.

The gather form's full-graph [N, K, D] row gather is HBM-bound at ~45 GB/s
effective (CLAUDE.md); hybrid mode replaces it with one resident [N, N] bf16
row-stochastic matmul on the MXU (models/pinsage.build_pool_matrix_chunked)
while the final layer keeps the cheap batch-restricted gather.

Usage: python scripts/pool59k_bench.py [--impls hybrid,gather] [--epochs 2]
Run on the TPU (default platform). One process; variants run sequentially in
the same Trainer so the graph/device arrays are shared.
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
    ap.add_argument("--impls", default="hybrid,gather")
    ap.add_argument("--pool-dtypes", default="bfloat16",
                    help="comma list: bfloat16,float8_e4m3fn — f8 halves the "
                         "HBM traffic of the [N, N] pool-matrix reads that "
                         "dominate the hybrid step")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--epoch-offset", type=int, default=0,
                    help="first epoch number passed to train_epoch. The "
                         "curriculum ramps hard negatives as min(epoch, "
                         "max_hard): offset 0 times the ramp-up (num_hard "
                         "0-1, the historical A/B setting); offset >= 6 "
                         "times the steady-state step (num_hard 6), which "
                         "is what production epochs cost")
    ap.add_argument("--pin-epoch", type=int, default=None,
                    help="run every epoch with THIS epoch number (one "
                         "program shape; the 2nd+ epochs are compile-free "
                         "steady state). Attribution tool: pin 0 (num_hard "
                         "0) vs pin >= 6 (num_hard 6) isolates the "
                         "in-program hard-negative walk + extra-embed cost")
    ap.add_argument("--max-pairs", type=int, default=50_000)
    ap.add_argument("--movies", type=int, default=59_000)
    ap.add_argument("--users", type=int, default=162_000)
    ap.add_argument("--ratings", type=int, default=8_000_000)
    ap.add_argument("--max-blocks", type=int, default=32,
                    help="block impl: col blocks kept per row block")
    ap.add_argument("--block-size", type=int, default=512)
    ap.add_argument("--hub-sweep", default="",
                    help="comma list of head:residual pairs (e.g. "
                         "'8192:8,16383:8,16383:16') — each hub-impl "
                         "variant in --impls reruns once per pair; empty = "
                         "config defaults (auto head, residual 8)")
    ap.add_argument("--arm", action="append", default=[], dest="arms",
                    help="explicit arm 'impl|dtype|head:residual' (repeatable;"
                         " dtype/shape parts optional, e.g. 'hub|float8_e4m3fn"
                         "|32768:8' or 'hybrid'). Overrides the --impls x "
                         "--pool-dtypes x --hub-sweep cross product, so a "
                         "campaign runs EXACTLY the arms it wants in priority "
                         "order — no wasted OOM arms from the product (a 256k "
                         "bf16 h32768 slab is 17 GB and can only error)")
    ap.add_argument("--dropped-cap", type=float, default=0.05,
                    help="block impl: gather fallback above this dropped mass")
    ap.add_argument("--gather-impls", default="default",
                    help="comma list of gather_impl values (default,xla,"
                         "pallas) — each value constructs a FRESH Trainer "
                         "(the jitted step caches on the Trainer instance, "
                         "so mutating gather_impl in place would silently "
                         "reuse the old program). 'pallas' through the "
                         "tunnel additionally needs MRE_TUNNEL_PALLAS=1 "
                         "(core/backend.pallas_allowed)")
    ap.add_argument("--watchdog", type=float, default=0.0,
                    help="seconds before the process exits itself (os._exit "
                         "after printing a marker) — a tunnel wedge must "
                         "end in a self-exit, never an external kill "
                         "(a killed TPU process wedges the chip claim, "
                         "CLAUDE.md)")
    ap.add_argument("--platform", default="default")
    args = ap.parse_args()

    if args.watchdog > 0:
        import threading

        def _fire():
            print(f"pool59k_bench WATCHDOG: timed out after "
                  f"{args.watchdog:.0f}s — self-exiting with partial results",
                  flush=True)
            os._exit(0)

        t = threading.Timer(args.watchdog, _fire)
        t.daemon = True
        t.start()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from movie_recommendation_engine_tpu import default_config
    from movie_recommendation_engine_tpu.core.logging import MetricsLogger
    from movie_recommendation_engine_tpu.graph import dataset
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    cfg = default_config()
    cfg.data.source = "synthetic"
    cfg.data.use_data_subset = False
    cfg.data.synthetic_num_movies = args.movies
    cfg.data.synthetic_num_users = args.users
    cfg.data.synthetic_num_ratings = args.ratings
    cfg.train.epochs = args.epochs
    cfg.train.max_pairs_per_epoch = args.max_pairs
    cfg.model.dropout = 0.0
    cfg.model.block_pool_max_blocks = args.max_blocks
    cfg.model.block_pool_block_size = args.block_size
    cfg.model.block_pool_max_dropped_mass = args.dropped_cap
    cfg.eval.eval_every = 0  # pure step timing
    cfg.paths.checkpoint_dir = "/tmp/pool59k_ck"
    cfg.paths.output_dir = "/tmp/pool59k_out"

    t0 = time.time()
    data = dataset.load(cfg)
    print(f"data {time.time()-t0:.1f}s; device={jax.devices()[0]}", flush=True)

    hub_sweep = [None]
    if args.hub_sweep:
        hub_sweep = []
        for pair in args.hub_sweep.split(","):
            head, res = pair.split(":")
            hub_sweep.append((int(head), int(res)))

    def parse_shape(spec):
        head, res = spec.split(":")
        return int(head), int(res)

    # Arm list: explicit --arm specs in the given order, else the historical
    # --impls x --pool-dtypes x --hub-sweep cross product.
    if args.arms:
        arm_list = []
        for spec in args.arms:
            parts = spec.split("|")
            impl = parts[0]
            # Empty dtype part = the CONFIG default ("auto" since round 5:
            # f8 where the bf16 head cap binds). Hardcoding bfloat16 here
            # silently pinned an "auto||" validation arm to the bf16 path
            # at 256k (observed r5).
            pdt = parts[1] if len(parts) > 1 and parts[1] else "auto"
            shape = (parse_shape(parts[2])
                     if len(parts) > 2 and parts[2] else None)
            arm_list.append((impl, pdt, shape))
    else:
        arm_list = []
        for impl in args.impls.split(","):
            dtypes = (args.pool_dtypes.split(",") if impl != "gather"
                      else ["bfloat16"])
            base = impl[:3] == "hub"
            shapes = hub_sweep if base else [None]
            for pdt in dtypes:
                for shape in shapes:
                    arm_list.append((impl, pdt, shape))

    results = {}
    for gi in args.gather_impls.split(","):
        if gi != "default":
            cfg.model.gather_impl = gi
        t0 = time.time()
        tr = Trainer(cfg, data, MetricsLogger())
        print(f"trainer(gather_impl={tr.gather_impl}) {time.time()-t0:.1f}s",
              flush=True)
        for name, pdt, shape in arm_list:
            # "hubf" = hub with the final layer hubbed too
            # (model.hub_pool_final_layer — batch slab rows instead of the
            # scattered [B, K, D] gather).
            hub_final = name == "hubf"
            impl = "hub" if hub_final else name
            tr.cfg.model.hub_pool_final_layer = hub_final
            label = name if pdt == "bfloat16" else f"{name}/{pdt}"
            if shape is not None:
                tr.cfg.model.hub_pool_head = shape[0]
                tr.cfg.model.hub_pool_residual = shape[1]
                label = f"{label}/h{shape[0]}r{shape[1]}"
            if gi != "default":
                label = f"{label}/{tr.gather_impl}"
            tr.cfg.model.pool_impl = impl
            tr.cfg.model.pool_matrix_dtype = pdt
            tr.nbr_tables = None  # force refresh (rebuilds pool_mats)
            tr.pool_mats = ()
            stats_all = []
            try:
                for i in range(args.epochs):
                    epoch = (args.pin_epoch
                             if args.pin_epoch is not None
                             else args.epoch_offset + i)
                    t0 = time.time()
                    stats = tr.train_epoch(epoch)
                    stats["wall_s"] = round(time.time() - t0, 2)
                    stats["impl"] = label
                    stats["epoch"] = epoch
                    print(json.dumps(stats, default=float), flush=True)
                    stats_all.append(stats)
            except Exception as e:
                # One arm must not sink the rest (a 256k hubf arm
                # OOMed and lost the remaining sweep in round 4).
                print(json.dumps({"impl": label,
                                  "error": f"{type(e).__name__}: "
                                           f"{e}"[:400]}),
                      flush=True)
                tr.nbr_tables = None
                tr.pool_mats = ()
                continue
            # Steady-state epoch (last; first includes compiles).
            results[label] = stats_all[-1]
        # _run_steps is jitted with STATIC self: the global jit cache pins
        # every Trainer it ever traced, pool matrices included (a 59k
        # hybrid A is ~7 GB) — dropping the reference alone frees nothing.
        # Same OOM trap scripts/quality_arms.py clears between arms.
        del tr
        jax.clear_caches()

    print("== summary ==")
    for label, s in results.items():
        print(f"{label}: {s['step_ms_avg']:.1f} ms/step avg, "
              f"{s['examples_per_sec']:.0f} examples/s "
              f"(loss {s['loss']:.4f}, num_hard {s['num_hard']})", flush=True)


if __name__ == "__main__":
    main()
