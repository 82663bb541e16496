"""Multi-arm quality runs in ONE process (one chip claim, shared compiles).

Each arm trains a fresh Trainer on the shared synthetic corpus and reports
HR@k/MRR on its test pairs, appending a section per arm to RESULTS.md.
Chaining scripts/quality_run.py invocations instead would pay a multi-minute
chip-claim wait plus a full set of tunnel recompiles per arm (CLAUDE.md:
batch TPU work into few processes).

Usage:
  python scripts/quality_arms.py --scale ml25m \\
      --arm "hub_seed43|epochs=10|max_pairs=500000|model.pool_impl=hub|train.seed=43" \\
      --arm "hybrid_seed43|epochs=10|max_pairs=500000|train.seed=43"

Arm syntax: label|k=v|... where epochs= and max_pairs= are runner-level and
any dotted key (model.pool_impl=hub) is a config override. data.* overrides
trigger a dataset rebuild for that arm.

--deadline N: arms not STARTED within N seconds of launch are skipped with a
printed marker (tunnel compile latency degrades late in a session —
CLAUDE.md); a watchdog at deadline+slack self-exits so a wedged arm can
never require an external kill.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

START = time.time()


def parse_arm(spec: str):
    parts = spec.split("|")
    label = parts[0]
    epochs, max_pairs, overrides = 10, 50_000, {}
    for p in parts[1:]:
        k, v = p.split("=", 1)
        if k == "epochs":
            epochs = int(v)
        elif k == "max_pairs":
            max_pairs = int(v)
        else:
            overrides[k] = v
    return label, epochs, max_pairs, overrides


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="ml25m",
                    choices=["small", "ml1m", "ml25m"])
    ap.add_argument("--arm", action="append", required=True, dest="arms")
    ap.add_argument("--deadline", type=float, default=0.0,
                    help="seconds from launch after which remaining arms "
                         "are skipped (0 = no deadline)")
    ap.add_argument("--out", default="RESULTS.md")
    ap.add_argument("--platform", default="default")
    args = ap.parse_args()

    if args.deadline > 0:
        import threading

        def _fire():
            print(f"quality_arms WATCHDOG: {args.deadline + 2400:.0f}s "
                  "elapsed — self-exiting with completed arms only",
                  flush=True)
            os._exit(0)

        t = threading.Timer(args.deadline + 2400, _fire)
        t.daemon = True
        t.start()

    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    import jax

    from movie_recommendation_engine_tpu import default_config
    from movie_recommendation_engine_tpu.cli.main import _parse_overrides
    from movie_recommendation_engine_tpu.core.logging import MetricsLogger
    from movie_recommendation_engine_tpu.evaluation import metrics
    from movie_recommendation_engine_tpu.graph import dataset
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    def base_cfg():
        cfg = default_config()
        cfg.data.source = "synthetic"
        cfg.data.use_data_subset = False
        if args.scale == "small":
            cfg.data.synthetic_num_movies = 800
            cfg.data.synthetic_num_users = 2000
            cfg.data.synthetic_num_ratings = 100_000
        elif args.scale == "ml1m":
            cfg.data.synthetic_num_movies = 3700
            cfg.data.synthetic_num_users = 6000
            cfg.data.synthetic_num_ratings = 1_000_000
        else:
            cfg.data.synthetic_num_movies = 59_000
            cfg.data.synthetic_num_users = 162_000
            cfg.data.synthetic_num_ratings = 8_000_000
        cfg.train.refresh_neighborhoods_every = 1
        cfg.model.dropout = 0.0
        cfg.eval.eval_every = 1
        cfg.eval.max_val_pairs = 50_000
        cfg.paths.checkpoint_dir = "/tmp/quality_arms_ck"
        cfg.paths.output_dir = "/tmp/quality_arms_out"
        return cfg

    data = None
    data_key = None
    for spec in args.arms:
        label, epochs, max_pairs, overrides = parse_arm(spec)
        if args.deadline > 0 and time.time() - START > args.deadline:
            print(json.dumps({"arm": label, "skipped": "deadline"}),
                  flush=True)
            continue
        cfg = base_cfg()
        cfg.train.epochs = epochs
        cfg.train.max_pairs_per_epoch = max_pairs
        cfg.eval.patience = epochs
        if overrides:
            cfg = cfg.override(_parse_overrides(
                [f"{k}={v}" for k, v in overrides.items()]))
        key = json.dumps(cfg.to_dict()["data"], sort_keys=True)
        if data is None or key != data_key:
            t0 = time.time()
            data = dataset.load(cfg)
            data_key = key
            print(f"[{label}] data {time.time()-t0:.1f}s", flush=True)
        t0 = time.time()
        tr = Trainer(cfg, data, MetricsLogger())
        print(f"[{label}] trainer {time.time()-t0:.1f}s; "
              f"device={jax.devices()[0]}", flush=True)

        t0 = time.time()
        fit = tr.fit()
        train_s = time.time() - t0
        best = fit.get("best_path")
        if best and os.path.exists(best + ".npz"):
            tr.load_checkpoint(best)
            print(f"[{label}] evaluating best_model (epoch {tr.epoch}, "
                  f"val {tr.best_metric:.4f})", flush=True)
        final = tr.evaluate()
        throughput = [h["examples_per_sec"] for h in fit["history"]]
        # Wall breakdown (VERDICT r4 #3): steady-state step throughput hides
        # the refresh share of wall time — record both so the RESULTS rows
        # carry the honest end-to-end cost per epoch.
        refresh_med = float(np.nanmedian(
            [h.get("refresh_seconds", float("nan")) for h in fit["history"]]))
        stepwall_med = float(np.nanmedian(
            [h.get("step_wall_seconds", float("nan"))
             for h in fit["history"]]))
        report = {
            "arm": label,
            "overrides": overrides,
            "epochs": epochs,
            "max_pairs": max_pairs,
            "train_seconds": round(train_s, 1),
            "examples_per_sec_median": float(np.nanmedian(throughput)),
            "refresh_seconds_median": round(refresh_med, 2),
            "step_wall_seconds_median": round(stepwall_med, 2),
            "trained": final,
        }
        print(json.dumps(report, default=float), flush=True)
        with open(args.out, "a") as f:
            f.write(f"\n## Quality arm `{label}` — "
                    f"{time.strftime('%Y-%m-%d %H:%M')} ({args.scale}, "
                    f"{jax.devices()[0]})\n\n")
            ov = " ".join(f"{k}={v}" for k, v in overrides.items())
            f.write(f"- overrides: `{ov or '(defaults)'}`; {epochs} epochs x "
                    f"{max_pairs} pairs; {report['train_seconds']}s "
                    f"(median {report['examples_per_sec_median']:.0f} "
                    f"examples/s); test pairs {final.get('num_pairs', '?')}\n")
            f.write(f"- wall/epoch median: refresh "
                    f"{report['refresh_seconds_median']}s + steps "
                    f"{report['step_wall_seconds_median']}s "
                    f"(total wall {report['train_seconds']}s / {epochs} "
                    f"epochs = {report['train_seconds'] / epochs:.1f}s — "
                    f"the remainder is eval + compiles)\n\n")
            f.write("| metric | trained PinSage |\n|---|---|\n")
            for k in ("hit_rate@10", "hit_rate@50", "hit_rate@100",
                      "hit_rate@500", "mrr", "mrr_standard"):
                f.write(f"| {k} | {final[k]:.4f} |\n")
        # Free the arm's device state before the next arm builds its own.
        # del alone is NOT enough: Trainer._run_steps is jitted with self
        # static, so the global jit cache retains every Trainer — including
        # its pool matrices (a hybrid arm pins 7 GB of A at 59k; observed
        # OOM on arm 4). Clearing the caches drops those refs; the next arm
        # recompiles anyway.
        del tr
        jax.clear_caches()
    print("quality_arms done", flush=True)


if __name__ == "__main__":
    main()
