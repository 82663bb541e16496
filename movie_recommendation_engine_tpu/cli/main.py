"""Unified CLI: one entry point for every mode the reference spreads across
four scripts (run.py / main.py / inference.py / demo.py — SURVEY.md §1 L6).

    python -m movie_recommendation_engine_tpu <mode> [--set key=value ...]

Modes: train | evaluate | recommend | benchmark | tune | demo | serve |
download | all (run.py:499-592 modes plus benchmark/demo/download from the
other scripts; serve is new — a persistent batched recommendation server).

Config overrides use dotted keys into the typed Config, e.g.
    --set train.learning_rate=3e-4 --set data.source=synthetic
replacing the reference's overlapping argparse/config-module system.
"""

from __future__ import annotations

import argparse
import ast
import json
import os
import sys

import numpy as np

from ..config import Config, default_config
from ..core import checkpoint as ckpt
from ..core.logging import MetricsLogger


def _parse_overrides(pairs: list[str]) -> dict:
    out = {}
    for pair in pairs:
        if "=" not in pair:
            raise SystemExit(f"--set expects key=value, got: {pair}")
        k, v = pair.split("=", 1)
        # ast.literal_eval only accepts Python-cased True/False/None; accept
        # the lowercase spellings too — otherwise `--set x=false` would fall
        # through to the truthy string "false" and silently invert the flag.
        low = v.strip().lower()
        if low in ("true", "false", "none"):
            out[k] = {"true": True, "false": False, "none": None}[low]
            continue
        try:
            out[k] = ast.literal_eval(v)
        except (ValueError, SyntaxError):
            out[k] = v
    return out


def _load_config(args) -> Config:
    cfg = default_config()
    if args.config:
        with open(args.config) as f:
            cfg = Config.from_json(f.read())
    if args.set:
        cfg = cfg.override(_parse_overrides(args.set))
    return cfg


def _make_trainer(cfg: Config, logger: MetricsLogger):
    from ..graph import dataset
    from ..train.trainer import Trainer

    data = dataset.load(cfg)
    return Trainer(cfg, data, logger)


def cmd_train(cfg: Config, args) -> int:
    from ..core.logging import trace

    logger = MetricsLogger()
    tr = _make_trainer(cfg, logger)
    resume = os.path.join(cfg.paths.checkpoint_dir, "last_model") if args.resume else None
    with trace(args.profile):
        result = tr.fit(resume_from=resume)
    logger.log("done", best_metric=result["best_metric"])
    return 0


def cmd_evaluate(cfg: Config, args) -> int:
    logger = MetricsLogger()
    tr = _make_trainer(cfg, logger)
    path = args.checkpoint or os.path.join(cfg.paths.checkpoint_dir, "best_model")
    if path.endswith(".pt") and os.path.exists(path):
        # Reference PyTorch checkpoint (train.py:102-112 format).
        from ..utils.torch_import import load_torch_checkpoint

        tr.params, meta = load_torch_checkpoint(path)
        logger.log("loaded_torch_checkpoint", path=path, **meta)
    elif os.path.exists(path + ".npz"):
        tr.load_checkpoint(path)
        logger.log("loaded_checkpoint", path=path)
    results = tr.evaluate()
    logger.log("evaluation", **results)
    # Persist embeddings like run.py:250 / inference.py:146-170, plus the
    # movieId<->idx mapping CSV (inference.py:160-170). Coordinator-gated
    # like checkpoints: under multi-host every rank runs this command.
    from ..parallel import mesh as mesh_mod

    emb = np.asarray(tr.movie_embeddings())
    if mesh_mod.is_coordinator():
        os.makedirs(cfg.paths.output_dir, exist_ok=True)
        ckpt.save_embeddings(
            os.path.join(cfg.paths.output_dir, "movie_embeddings"),
            emb, tr.data.movie_ids,
        )
        import csv

        with open(os.path.join(cfg.paths.output_dir, "movie_id_mapping.csv"),
                  "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["idx", "movieId", "title"])
            for i, mid in enumerate(tr.data.movie_ids):
                w.writerow([i, int(mid), tr.data.titles[i]])
    mesh_mod.barrier("embeddings_export")
    return 0


def _load_or_compute_embeddings(cfg: Config, args, logger):
    emb_path = os.path.join(cfg.paths.output_dir, "movie_embeddings.npz")
    tr = _make_trainer(cfg, logger)
    path = args.checkpoint or os.path.join(cfg.paths.checkpoint_dir, "best_model")
    if path.endswith(".pt") and os.path.exists(path):
        from ..utils.torch_import import load_torch_checkpoint

        tr.params, _ = load_torch_checkpoint(path)
    elif os.path.exists(path + ".npz"):
        tr.load_checkpoint(path)
    if args.use_saved_embeddings and os.path.exists(emb_path):
        emb, movie_ids = ckpt.load_embeddings(emb_path)
        # Saved rows must correspond 1:1 to this dataset's movie indices —
        # otherwise every id/title lookup downstream is misaligned (e.g.
        # embeddings saved from one dataset served against another).
        if (len(movie_ids) == len(tr.data.movie_ids)
                and np.array_equal(np.asarray(movie_ids, np.int64),
                                   np.asarray(tr.data.movie_ids, np.int64))):
            return tr, emb
        logger.log("saved_embeddings_mismatch", path=emb_path,
                   saved_rows=int(len(movie_ids)),
                   dataset_rows=int(len(tr.data.movie_ids)))
    return tr, np.asarray(tr.movie_embeddings())


def cmd_recommend(cfg: Config, args) -> int:
    """Top-k similar movies for --movie-id via the configured search method
    (run.py:431-497, inference.py:96-144)."""
    import jax.numpy as jnp

    from ..retrieval.bench import make_index

    logger = MetricsLogger(pretty=False)
    tr, emb = _load_or_compute_embeddings(cfg, args, logger)
    data = tr.data
    lut = data.movie_id_to_idx()
    if args.movie_id is not None and int(args.movie_id) in lut:
        qidx = lut[int(args.movie_id)]
    elif args.movie_id is not None:
        print(f"movieId {args.movie_id} not in dataset")
        return 1
    else:
        qidx = 0

    k = args.k
    method = cfg.search.search_method
    if method == "exact":
        from ..evaluation.metrics import recommend as rec

        scores, idx = rec(jnp.asarray(emb), jnp.asarray([qidx], jnp.int32), k=k)
        idx = np.asarray(idx)[0]
        scores = np.asarray(scores)[0]
    else:
        index = make_index(method, emb.shape[1], cfg)
        index.build(emb)
        d, i = index.search(emb[qidx : qidx + 1], k=k + 1)
        idx = np.asarray(i)[0]
        scores = -np.asarray(d)[0]
        keep = idx != qidx
        idx, scores = idx[keep][:k], scores[keep][:k]

    print(f"\nQuery: [{data.movie_ids[qidx]}] {data.titles[qidx]} ({data.genres[qidx]})")
    print(f"Top-{k} recommendations ({method}):")
    rows = []
    for rank, (i, s) in enumerate(zip(idx, scores), 1):
        i = int(i)
        print(f"  {rank:2d}. [{data.movie_ids[i]}] {data.titles[i]} "
              f"({data.genres[i]}) score={float(s):.4f}")
        rows.append((rank, int(data.movie_ids[i]), data.titles[i], float(s)))
    if args.save_csv:
        import csv

        os.makedirs(cfg.paths.output_dir, exist_ok=True)
        out = os.path.join(cfg.paths.output_dir, "recommendations.csv")
        with open(out, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["rank", "movieId", "title", "score"])
            w.writerows(rows)
        print(f"saved {out}")
    return 0


def cmd_benchmark(cfg: Config, args) -> int:
    """exact/LSH/IVF latency + recall report
    (utils/nearest_neighbors.py:141-254)."""
    from ..retrieval.bench import benchmark_search_methods, print_benchmark

    logger = MetricsLogger(pretty=False)
    tr, emb = _load_or_compute_embeddings(cfg, args, logger)
    rng = np.random.default_rng(cfg.train.seed)
    nq = min(args.num_queries, emb.shape[0])
    q = emb[rng.choice(emb.shape[0], nq, replace=False)]
    methods = ["exact", "lsh", "lsh_rerank", "ivf"]
    if cfg.search.lsh_rerank > 0:
        # The configured LSH already reranks; one row covers both. (Don't
        # re-append below even when search_method == "lsh_rerank" — that
        # would build and time the identical configuration twice.)
        methods.remove("lsh_rerank")
    if cfg.search.search_method not in methods and not (
        cfg.search.search_method == "lsh_rerank" and cfg.search.lsh_rerank > 0
    ):
        methods.append(cfg.search.search_method)  # e.g. sharded_exact
    results = benchmark_search_methods(emb, q, k=args.k, cfg=cfg,
                                       methods=methods)
    print_benchmark(results, k=args.k)
    return 0


def cmd_tune(cfg: Config, args) -> int:
    from ..train.tune import hyperparameter_tuning

    logger = MetricsLogger()
    kwargs = {}
    if args.lrs:
        kwargs["learning_rates"] = [
            float(v) for v in args.lrs.split(",") if v.strip()
        ]
    if args.hidden_dims:
        kwargs["hidden_dims"] = [
            int(v) for v in args.hidden_dims.split(",") if v.strip()
        ]
    result = hyperparameter_tuning(cfg, logger, **kwargs)
    logger.log("tune_done", best=result["best"])
    return 0


def cmd_serve(cfg: Config, args) -> int:
    """Persistent batched recommendation server (retrieval/server.py) over
    the configured index. Loads embeddings the same way recommend does."""
    from ..retrieval.server import BatchingRecommender, make_http_server

    logger = MetricsLogger()
    tr, emb = _load_or_compute_embeddings(cfg, args, logger)
    rec = BatchingRecommender(
        emb, method=cfg.search.search_method, cfg=cfg,
        max_batch=cfg.serve.max_batch, max_wait_ms=cfg.serve.max_wait_ms,
        max_k=cfg.serve.max_k,
    )
    port = args.port if args.port is not None else cfg.serve.port
    httpd = make_http_server(rec, cfg.serve.host, port,
                             movie_ids=tr.data.movie_ids, titles=tr.data.titles)
    logger.log("serving", host=cfg.serve.host, port=httpd.server_address[1],
               ntotal=rec.ntotal, method=rec.method)
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()
        rec.close()
    return 0


def cmd_demo(cfg: Config, args) -> int:
    from .demo import run_demo

    return run_demo(cfg, args)


def cmd_download(cfg: Config, args) -> int:
    from ..graph.download import download_ml25m

    return 0 if download_ml25m(cfg.data.data_dir) else 1


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="movie_recommendation_engine_tpu",
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter,
    )
    ap.add_argument("mode", choices=[
        "train", "evaluate", "recommend", "benchmark", "tune", "demo",
        "serve", "download", "all",
    ])
    ap.add_argument("--config", help="path to a Config JSON")
    ap.add_argument("--set", action="append", default=[],
                    help="dotted config override key=value (repeatable)")
    ap.add_argument("--checkpoint", help="checkpoint path (without .npz)")
    ap.add_argument("--resume", action="store_true",
                    help="resume training from the last checkpoint")
    ap.add_argument("--movie-id", type=int, help="query movieId for recommend")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--num-queries", type=int, default=256,
                    help="benchmark query count")
    ap.add_argument("--port", type=int, default=None,
                    help="serve mode: listen port (default serve.port)")
    ap.add_argument("--use-saved-embeddings", action="store_true")
    ap.add_argument("--save-csv", action="store_true")
    ap.add_argument("--profile", metavar="DIR",
                    help="write a jax.profiler trace of training to DIR")
    ap.add_argument("--lrs", default=None,
                    help="tune mode: comma list of learning rates "
                         "(default 1e-3,5e-4)")
    ap.add_argument("--hidden-dims", default=None,
                    help="tune mode: comma list of hidden dims "
                         "(default 128,256)")
    ap.add_argument("--platform", choices=["cpu", "tpu", "axon", "default"],
                    default="default",
                    help="force the JAX platform (overrides env/plugins)")
    args = ap.parse_args(argv)
    if args.platform != "default":
        import jax

        jax.config.update("jax_platforms", args.platform)
    # Multi-host: join the jax.distributed cluster when the standard env
    # vars are set (no-op otherwise). Must precede any backend use.
    from ..parallel.mesh import distributed_init

    if distributed_init():
        import jax

        MetricsLogger().log(
            "distributed_init",
            process_index=jax.process_index(),
            process_count=jax.process_count(),
            local_devices=len(jax.local_devices()),
            global_devices=len(jax.devices()),
        )
    cfg = _load_config(args)

    if args.mode == "all":  # run.py mode 'all': train then evaluate then recommend
        rc = cmd_train(cfg, args)
        rc = rc or cmd_evaluate(cfg, args)
        return rc or cmd_recommend(cfg, args)
    return {
        "train": cmd_train,
        "evaluate": cmd_evaluate,
        "recommend": cmd_recommend,
        "benchmark": cmd_benchmark,
        "tune": cmd_tune,
        "demo": cmd_demo,
        "serve": cmd_serve,
        "download": cmd_download,
    }[args.mode](cfg, args)


if __name__ == "__main__":
    sys.exit(main())
