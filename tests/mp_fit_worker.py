"""Run the REAL ``Trainer.fit()`` under a multi-process jax.distributed
cluster (VERDICT r3 #3: tests/mp_worker.py exercised a hand-rolled sharded
epoch; the actual fit() loop — per-rank ``_epoch_pairs`` determinism,
``refresh_neighborhoods`` RNG agreement, ``save_checkpoint`` barrier
ordering, survivor resume — had only ever run single-process).

Each of N processes hosts 4 virtual CPU devices; together they form one
(data=N, model=4) cluster with gloo collectives and row-sharded tables
(``mesh.shard_tables=True``), so every fit() epoch crosses the process
boundary in both the gradient psum (data axis) and the table shardings.

The worker prints ONE JSON verdict line with per-epoch losses plus digests
of every host-side nondeterminism source (epoch pair selection, neighborhood
tables, RNG key) — the test compares them across ranks byte-for-byte.
Cross-rank loss equality alone would NOT prove input agreement: the loss is
a collective result, so ranks feeding diverged batch shards still print the
same number; the digests are the real invariant.

Usage: python tests/mp_fit_worker.py <pid> <nproc> <port> <ckpt_dir>
           <epochs> [resume_path|-]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys


def main() -> int:
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
    ckpt_dir = sys.argv[4]
    epochs = int(sys.argv[5])
    resume = sys.argv[6] if len(sys.argv) > 6 and sys.argv[6] != "-" else None

    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=4"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")  # env alone is ignored (axon
    # sitecustomize); see CLAUDE.md.
    jax.config.update("jax_cpu_collectives_implementation", "gloo")

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    from movie_recommendation_engine_tpu.parallel.mesh import distributed_init

    assert distributed_init(coordinator=f"127.0.0.1:{port}",
                            num_processes=nproc, process_id=pid)
    assert jax.process_count() == nproc

    import numpy as np

    from movie_recommendation_engine_tpu.config import small_test_config
    from movie_recommendation_engine_tpu.core import checkpoint as ckpt
    from movie_recommendation_engine_tpu.core.logging import MetricsLogger
    from movie_recommendation_engine_tpu.graph import dataset
    from movie_recommendation_engine_tpu.train.trainer import Trainer

    cfg = small_test_config()
    # Slightly bigger than small_test_config's corpus so the val split
    # yields co-rated pairs — fit() must exercise the val-gated
    # best-checkpoint write (coordinator-gated + barrier'd) across ranks.
    cfg.data.synthetic_num_movies = 400
    cfg.data.synthetic_num_users = 800
    cfg.data.synthetic_num_ratings = 20_000
    cfg.train.epochs = epochs
    cfg.eval.eval_every = 1
    cfg.eval.patience = epochs  # no early stop — epoch counts must be exact
    cfg.mesh.mesh_shape = (nproc, 4)  # data axis spans processes
    cfg.mesh.shard_tables = True
    cfg.paths.checkpoint_dir = ckpt_dir
    cfg.paths.output_dir = os.path.join(ckpt_dir, "out")

    data = dataset.load(cfg)          # deterministic synthetic — same files-
    tr = Trainer(cfg, data, MetricsLogger())  # equivalent inputs on each rank

    start_epoch = 0
    if resume:
        meta = ckpt.load_meta(resume)
        start_epoch = int(meta["epoch"])

    fit = tr.fit(resume_from=resume)
    losses = [round(float(h["loss"]), 10) for h in fit["history"]]
    val_keys = sorted(k for k in (fit["history"][0] if fit["history"] else {})
                      if k.startswith("val_"))

    def digest(*arrays) -> str:
        h = hashlib.sha256()
        for a in arrays:
            h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
        return h.hexdigest()[:16]

    # Re-derive each epoch's pair selection exactly as train_epoch did (the
    # rng is freshly seeded per epoch, so this reproduces, not consumes).
    pair_digests = [
        digest(tr._epoch_pairs(np.random.default_rng(cfg.train.seed + 1000 + e)))
        for e in range(start_epoch, epochs)
    ]
    # Neighborhood tables are row-sharded over the model axis — hash only
    # the locally addressable shards (global np.asarray of a multi-process
    # array raises); shard order is deterministic per rank, and the test
    # compares ranks' LOCAL digests only when they hold the same rows (model
    # axis is host-local here, so every rank holds every row).
    tbl_digest = digest(*[
        s.data for nb, w in tr.nbr_tables for arr in (nb, w)
        for s in arr.addressable_shards
    ])
    rng_digest = digest(tr.rng)

    last = os.path.join(ckpt_dir, "last_model")
    meta = ckpt.load_meta(last)

    print(json.dumps({
        "pid": pid,
        "process_count": jax.process_count(),
        "start_epoch": start_epoch,
        "losses": losses,
        "has_val": bool(val_keys),
        "pair_digests": pair_digests,
        "tbl_digest": tbl_digest,
        "rng_digest": rng_digest,
        "ckpt_epoch": int(meta["epoch"]),
        "ckpt_tag": meta["tag"],
        "best_metric": float(tr.best_metric),
        "ok": bool(len(losses) == epochs - start_epoch
                   and int(meta["epoch"]) == epochs),
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
