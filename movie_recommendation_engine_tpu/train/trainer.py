"""Training runtime: jitted PinSage train step, epoch driver, checkpoint/resume.

This implements the reference's *documented* training design (README:130-168;
SURVEY.md §7 hard part 4): contrastive training over random + rank-window hard
negatives on importance-pooled graph embeddings — the components the reference
constructs (run.py:97-122) but never wires into its shipped loop
(train.py:8-124). The default objective is sampled-softmax NCE
(models/losses.nce_loss — the reference's max-margin hinge provably collapses;
set ``train.loss = "curriculum"``/"max_margin" for parity). The shipped
simplified loop (MLP path + negative-mean-cosine objective) is available via
``cfg.train.train_path = "mlp"``.

TPU design:
- Neighborhood tables ([N, K] ids + weights per layer) are sampled on device
  and refreshed every ``refresh_neighborhoods_every`` epochs; the train step
  is then a single pure jitted program: gather -> pooled GCN forward ->
  loss -> grads -> Adam, with bf16 matmuls on the MXU.
- Validation is *real* HR@k on held-out pairs every ``eval_every`` epochs —
  the reference's validation hitrate is simulated (train.py:93,
  ``0.5 + epoch/(2*EPOCHS)``), which we deliberately fix.
- Checkpointing restores model + optimizer + RNG + schedule state (true
  resume; the reference saves optimizer state but never restores it).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..core import checkpoint as ckpt
from ..core.logging import MetricsLogger
from ..evaluation import metrics as eval_metrics
from ..graph import features as feat_mod
from ..graph.dataset import MovieLensData
from ..graph.split import corated_item_pairs
from ..models import losses, pinsage
from ..sampling import negative, random_walk as rw
from . import optim


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


# Module-level so the trace caches across refreshes — a fresh
# `jax.jit(lambda ...)` per refresh would recompile the [N, N] cast every
# epoch (minutes over the tunnel's remote compiler).
@partial(jax.jit, static_argnames=("dtype",))
def _cast_matrix(m, dtype):
    return m.astype(dtype)


class Trainer:
    """End-to-end training driver. Construct once per dataset+config."""

    def __init__(self, cfg: Config, data: MovieLensData, logger: MetricsLogger | None = None):
        self.cfg = cfg
        self.data = data
        self.log = logger or MetricsLogger()

        # ---- graph ---------------------------------------------------------
        if cfg.graph.use_bipartite_graph:
            self.csr = data.build_bipartite_graph()
        else:
            self.csr = data.build_item_similarity_graph(
                threshold=cfg.graph.similarity_threshold
            )
        self.graph = rw.device_graph(self.csr)
        self.n_iters = rw.search_iters(self.csr)

        # ---- features ------------------------------------------------------
        movie_features = feat_mod.extract_movie_features(
            data.titles, data.genres, data.movie_tags,
            feature_dim=cfg.features.feature_dim,
            genre_weight=cfg.features.genre_weight,
            year_norm=cfg.features.year_norm,
            title_tfidf_max=cfg.features.title_tfidf_max_features,
            title_tfidf_min_df=cfg.features.title_tfidf_min_df,
            tag_tfidf_max=cfg.features.tag_tfidf_max_features,
            tag_tfidf_min_df=cfg.features.tag_tfidf_min_df,
            seed=cfg.train.seed,
            standardize=cfg.features.standardize,
        )
        if cfg.features.use_visual_features:
            vis = feat_mod.create_visual_features(
                data.num_movies, cfg.features.feature_dim, seed=cfg.train.seed
            )
            movie_features = movie_features + vis  # additive fusion

        self.movies_only = (
            cfg.model.pool_nodes == "movies_only" or not cfg.graph.use_bipartite_graph
        )
        if self.movies_only:
            self.x_table = jnp.asarray(movie_features)
            self.valid_limit = data.num_movies
        else:
            self.x_table = jnp.asarray(
                feat_mod.node_feature_table(movie_features, data.num_users)
            )
            # Mask sentinel ids (== num_nodes) explicitly: with sharded
            # tables the row padding extends past the sentinel, and a None
            # limit would let empty slots gather pad rows / absorb weight.
            self.valid_limit = self.csr.num_nodes
        self.table_rows = int(self.x_table.shape[0])

        # ---- splits & pairs ------------------------------------------------
        tr, va, te = data.temporal_split(cfg.train.val_ratio, cfg.train.test_ratio)
        self.splits = (tr, va, te)
        seed = cfg.train.seed
        self.train_pairs = corated_item_pairs(
            tr.user_idx, tr.movie_idx, tr.ratings,
            min_rating=cfg.eval.corated_min_rating, seed=seed,
        )
        self.val_pairs = corated_item_pairs(
            va.user_idx, va.movie_idx, va.ratings,
            min_rating=cfg.eval.corated_min_rating, seed=seed + 1,
        )
        self.test_pairs = corated_item_pairs(
            te.user_idx, te.movie_idx, te.ratings,
            min_rating=cfg.eval.corated_min_rating, seed=seed + 2,
        )
        if self.train_pairs.shape[0] == 0:
            # Degenerate tiny datasets: fall back to user-movie interaction
            # pairs mapped into movie space (both endpoints = the movie).
            m = tr.movie_idx
            self.train_pairs = np.stack([m, m], axis=1)
        if self.train_pairs.shape[0] == 0:
            raise ValueError(
                "no training pairs: the train split is empty (check "
                "data.min_interactions / val_ratio / test_ratio)"
            )

        # ---- model / optimizer --------------------------------------------
        key = jax.random.PRNGKey(seed)
        key, pkey = jax.random.split(key)
        self.params = pinsage.init_params(
            pkey, cfg.features.feature_dim, cfg.model.hidden_dim,
            cfg.model.embed_dim, cfg.model.num_layers, cfg.model.aggregator_type,
            use_batch_norm=cfg.model.use_batch_norm,
            init_style=cfg.model.init_style,
        )
        self.opt_state = optim.adam_init(self.params)
        self.plateau = optim.plateau_init(cfg.train.learning_rate)
        self.rng = key
        self.epoch = 0
        self.best_metric = -float("inf")
        self.nbr_tables: list[tuple[jax.Array, jax.Array]] | None = None
        self.pool_mats: tuple = ()
        self._block_perm: np.ndarray | None = None  # cached cluster order
        self.compute_dtype = _dtype(cfg.train.compute_dtype)
        if cfg.train.lr_plateau_monitor not in ("train_loss", "val_metric"):
            # A typo here would silently train under the wrong LR schedule
            # (the string is only compared inside fit()'s epoch loop).
            raise ValueError(
                "train.lr_plateau_monitor must be 'train_loss' or "
                f"'val_metric', got {cfg.train.lr_plateau_monitor!r}"
            )
        # Steps scanned per device dispatch (see _run_steps).
        self.steps_per_call = 8

        # Gather-form pooling implementation (config.ModelConfig.gather_impl).
        # "auto" resolves to the fused Pallas kernel only on a real local TPU
        # backend: the axon tunnel's remote compiler cannot build Mosaic
        # kernels (hangs/413 — CLAUDE.md), and off-TPU the kernel would run
        # in interpret mode. MRE_USE_PALLAS=1 forces it for probe runs.
        from ..core.backend import pallas_allowed

        gi = cfg.model.gather_impl
        mesh_active = cfg.mesh.mesh_shape is not None
        if gi == "auto":
            # auto = xla, everywhere. Measured on real silicon inside the
            # 59k train step (RESULTS.md "Pallas gather kernel inside the
            # real 59k train step"): the fused DMA-gather kernel is 2.4x
            # SLOWER than the XLA gather+einsum at production shapes (the
            # sublane-window read amplification loses to XLA's batched
            # gather), so auto no longer resolves to pallas on local TPUs.
            # MRE_USE_PALLAS=1 still forces the kernel for probe runs
            # (compiled on TPU, interpret elsewhere) — never under a mesh:
            # pl.pallas_call has no SPMD partitioning rule.
            force = os.environ.get("MRE_USE_PALLAS") == "1"
            gi = "pallas" if (force and not mesh_active
                              and pallas_allowed()) else "xla"
        elif gi == "pallas" and (not pallas_allowed() or mesh_active):
            self.log.log(
                "gather_impl_downgraded", requested="pallas",
                reason=("pallas_call has no SPMD partitioning rule (mesh)"
                        if mesh_active
                        else "tunnel Mosaic compile needs MRE_TUNNEL_PALLAS=1"))
            gi = "xla"
        # Threaded through every forward call (not module-global state: a
        # second Trainer in the same process must not clobber this one).
        self.gather_impl = gi
        if gi != "xla":
            self.log.log("gather_impl", impl=gi)

        # ---- optional device mesh (multi-chip) -----------------------------
        # Opt-in via cfg.mesh.mesh_shape. Batch dims are sharded over "data"
        # (gradient psum inserted by the SPMD partitioner); tables are
        # row-sharded over "model" when cfg.mesh.shard_tables. The SAME
        # jitted program runs either way — sharding comes from input
        # placement, not separate code.
        self.mesh = None
        if cfg.mesh.mesh_shape is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            from ..parallel import mesh as mesh_mod

            self.mesh = mesh_mod.make_mesh(tuple(cfg.mesh.mesh_shape))
            self._data_size = self.mesh.shape[cfg.mesh.data_axis]
            model_size = self.mesh.shape[cfg.mesh.model_axis]
            self._batch_sharding = NamedSharding(self.mesh, P(None, "data"))
            if cfg.mesh.shard_tables and model_size > 1:
                self._row_sharding = NamedSharding(self.mesh, P("model", None))
                xt, _ = mesh_mod.pad_to_multiple(np.asarray(self.x_table), model_size)
                self.x_table = jax.device_put(jnp.asarray(xt), self._row_sharding)
                self.table_rows = int(xt.shape[0])
                if cfg.mesh.shard_graph:
                    # Row-shard the O(E) CSR too — the replicated DeviceGraph
                    # is otherwise the per-chip memory wall at the 10M-item
                    # regime (~11 GiB/chip, docs/DESIGN.md). The sharded walk
                    # is bit-identical (sampling/sharded_walk.py), so the
                    # in-step hard-negative walks and refreshes are unchanged
                    # numerically; the PPR strategy pushes along local edge
                    # slices + a frontier psum (float-tolerance equal).
                    from ..sampling import sharded_walk as sw

                    self.graph = sw.sharded_device_graph(
                        self.csr, self.mesh, axis=cfg.mesh.model_axis)
            else:
                self._row_sharding = NamedSharding(self.mesh, P())
                self.x_table = jax.device_put(self.x_table, self._row_sharding)

        self.log.log(
            "init",
            num_movies=data.num_movies, num_users=data.num_users,
            num_nodes=self.csr.num_nodes, num_edges=self.csr.num_edges,
            num_params=pinsage.num_params(self.params),
            train_pairs=int(self.train_pairs.shape[0]),
            val_pairs=int(self.val_pairs.shape[0]),
            test_pairs=int(self.test_pairs.shape[0]),
        )

    # ---- neighborhoods ----------------------------------------------------

    def refresh_neighborhoods(self) -> None:
        """Resample per-layer neighborhood tables for every table row
        (model/pinsage.py:271-275 samples one table per layer)."""
        cfg = self.cfg
        restrict = (
            self.data.num_movies
            if cfg.walk.count_nodes == "movies" and cfg.graph.use_bipartite_graph
            else None
        )
        self.rng, k = jax.random.split(self.rng)
        if cfg.walk.strategy == "ppr":
            if self.nbr_tables is not None:
                return  # PPR is deterministic — refreshing recomputes the
                        # same tables (and pool matrices); skip after epoch 0.
            from ..sampling import ppr as ppr_mod

            tables = ppr_mod.all_node_neighborhood_tables_ppr(
                self.graph, cfg.model.num_layers, cfg.walk.num_neighbors,
                num_nodes=self.table_rows, restrict_below=restrict,
                alpha=cfg.walk.ppr_alpha,
                num_iterations=cfg.walk.ppr_iterations,
                batch=cfg.walk.ppr_batch,
            )
        elif cfg.walk.strategy == "random_walk":
            tables = rw.all_node_neighborhood_tables(
                self.graph, k, cfg.model.num_layers,
                cfg.walk.num_walks, cfg.walk.walk_length,
                cfg.walk.num_neighbors, self.n_iters,
                num_nodes=self.table_rows,
                restrict_below=restrict,
            )
        else:
            raise ValueError(
                f"unknown walk.strategy {cfg.walk.strategy!r} "
                "(expected 'random_walk' or 'ppr')"
            )
        if self.mesh is not None:
            tables = [
                (jax.device_put(nbrs, self._row_sharding),
                 jax.device_put(w, self._row_sharding))
                for nbrs, w in tables
            ]
        self.nbr_tables = tables

        # Dense pooling matrices (MXU path) when the corpus is small enough
        # and the aggregator is linear pooling. "hybrid" keeps ONE [N, N]
        # matrix per full-graph layer (0..L-2) and leaves the final layer on
        # the batch-restricted gather — at ML-25M scale (59k rows) the full
        # dense set (2 x 7 GB bf16) doesn't fit HBM but the hybrid's single
        # matrix does, and it removes the step-dominating full-graph gather.
        self.pool_mats = ()
        n_dense = 0
        n_hub = 0
        n_block = 0
        impl = cfg.model.pool_impl
        n_layers = cfg.model.num_layers
        eligible = (
            cfg.model.aggregator_type == "importance"
            and cfg.train.train_path != "mlp"
        )
        if eligible:
            if impl == "dense" or (
                impl == "auto" and self.table_rows <= cfg.model.dense_pool_max_rows
            ):
                n_dense = n_layers
            elif n_layers > 1 and (
                impl == "hybrid"
                or (impl == "auto"
                    and self.table_rows <= cfg.model.dense_pool_hybrid_max_rows)
            ):
                n_dense = n_layers - 1
            elif n_layers > 1 and impl in ("hub", "block", "auto"):
                # The >64k regime: [N, N] no longer fits HBM. auto prefers
                # the hub factorization (dense head + sparse residual,
                # ops/hub_pool.py) and falls back to block tiling, then
                # gather, when a form would drop too much pooling weight.
                if impl == "block":
                    n_block = n_layers - 1
                else:
                    # hub_pool_final_layer: hub the batch-restricted final
                    # layer too (contiguous [B, head] slab rows instead of
                    # the scattered [B, K, D] gather — ops/hub_pool.py).
                    hub_final = cfg.model.hub_pool_final_layer
                    if (impl == "auto" and cfg.model.auto_hub_final
                            and not hub_final):
                        # Auto-enable the hubbed final layer when the full
                        # slab set fits the capacity budget (measured: 2 x
                        # 4.3 GB fits v5e at <=131k bf16 / hubf-f8-16384;
                        # 2 x 8.6 GB OOMs at 256k). The per-layer dropped-
                        # mass gate below still protects quality.
                        from ..ops.hub_pool import (auto_head,
                                                    resolve_pool_matrix_dtype)

                        dt = resolve_pool_matrix_dtype(
                            cfg.model.pool_matrix_dtype, self.table_rows,
                            "hub", head_cfg=cfg.model.hub_pool_head)
                        head = (cfg.model.hub_pool_head
                                if cfg.model.hub_pool_head > 0
                                else auto_head(self.table_rows, dt))
                        slab_bytes = (n_layers * self.table_rows
                                      * min(head, self.table_rows)
                                      * jnp.dtype(dt).itemsize)
                        hub_final = (slab_bytes
                                     <= cfg.model.auto_hub_final_max_bytes)
                    n_hub = n_layers if hub_final else n_layers - 1
        if n_hub:
            from ..ops import hub_pool as hub_mod

            pool_dtype = hub_mod.resolve_pool_matrix_dtype(
                cfg.model.pool_matrix_dtype, self.table_rows, "hub",
                head_cfg=cfg.model.hub_pool_head)
            mats = []
            for nbrs, w in tables[:n_hub]:
                # Device-side build: the host builder's walk-table download
                # (~90 MB over the relay at 59k) + numpy argsorts cost
                # 25-35 s per refresh; the jitted build costs milliseconds
                # plus two scalar syncs (measured A/B in RESULTS.md).
                # The scatter targets pool_dtype DIRECTLY (f8 included):
                # neighbor ids are distinct within a row (walk RLE top-K /
                # PPR top-K), so every slab cell is written at most once —
                # no f8 additions ever happen; the direct build is a single
                # f32->f8 rounding (tighter than the old bf16-then-cast
                # double rounding) and avoids the bf16 transient that would
                # cap the f8 head at 256k (an [N, 32768] bf16 slab is
                # 17 GB; built in f8 it is 8.6 GB).
                hp, stats = hub_mod.build_hub_pool_device(
                    jnp.asarray(nbrs), jnp.asarray(w),
                    valid_limit=self.valid_limit,
                    head=cfg.model.hub_pool_head,
                    residual=cfg.model.hub_pool_residual,
                    dtype=pool_dtype,
                    # Keep the [N, H] slab row-sharded through the build —
                    # without the constraint GSPMD replicates the scatter
                    # output on every device (the per-device memory wall
                    # row sharding exists to avoid).
                    a_head_sharding=(self._row_sharding
                                     if self.mesh is not None else None),
                )
                self.log.log("hub_pool", **stats)
                hub_cap = (cfg.model.hub_pool_max_dropped_mass
                           if cfg.model.hub_pool_max_dropped_mass >= 0
                           else cfg.model.block_pool_max_dropped_mass)
                if stats["dropped_mass"] > hub_cap:
                    # First escape: DOUBLE the residual once before giving
                    # up the hub form. Measured at 256k (RESULTS.md): the
                    # auto head caps at 16384 = N/16 and r8 drops 5.17%
                    # (just over the 5% gate), while r16 drops 0.42% at
                    # 193 vs 111 ms/step — still far cheaper than the
                    # gather fallback. Residual rows cost gather bandwidth
                    # but no slab HBM, so this is the escape that always
                    # fits.
                    r2 = min(cfg.model.hub_pool_residual * 2,
                             int(jnp.shape(nbrs)[1]))
                    if r2 > cfg.model.hub_pool_residual:
                        # Free the gate-failing build BEFORE the escalated
                        # one: `hp, stats = build(...)` evaluates the RHS
                        # while the old hp is still referenced, so at 256k
                        # two 8.6 GB slabs coexist and OOM the chip
                        # (observed round 5 — r4's 193 ms r16 row was built
                        # directly, never through this path).
                        del hp
                        hp, stats = hub_mod.build_hub_pool_device(
                            jnp.asarray(nbrs), jnp.asarray(w),
                            valid_limit=self.valid_limit,
                            head=cfg.model.hub_pool_head,
                            residual=r2,
                            dtype=pool_dtype,
                            a_head_sharding=(self._row_sharding
                                             if self.mesh is not None
                                             else None),
                        )
                        self.log.log("hub_pool_residual_escalated",
                                     residual=r2, **stats)
                if stats["dropped_mass"] > hub_cap:
                    # Mass not hub-concentrated enough; auto tries the
                    # clustered block tiling next, then gather. Drop the
                    # failed slab NOW — `hp` stays in scope past the break,
                    # and an 8.6 GB slab held through the block build is
                    # the same OOM class as the escalation double-buffer.
                    del hp
                    self.log.log("hub_pool_fallback",
                                 dropped_mass=stats["dropped_mass"])
                    mats = []
                    if impl == "auto":
                        n_block = n_hub
                    break
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    repl = NamedSharding(self.mesh, P())
                    hp = hp._replace(
                        a_head=jax.device_put(hp.a_head, self._row_sharding),
                        head_ids=jax.device_put(hp.head_ids, repl),
                        res_nbrs=jax.device_put(hp.res_nbrs, self._row_sharding),
                        res_w=jax.device_put(hp.res_w, self._row_sharding),
                    )
                mats.append(hp)
            if mats:
                self.pool_mats = tuple(mats)
                return
        if n_block:
            from ..ops import block_sparse as bsp

            if self._block_perm is None:
                t0 = time.perf_counter()
                if cfg.model.block_pool_order == "mass":
                    self._block_perm = bsp.mass_permutation(
                        np.asarray(tables[0][0]), np.asarray(tables[0][1]),
                        valid_limit=self.valid_limit,
                    )
                else:  # "feature": legacy content-k-means order
                    self._block_perm = bsp.cluster_permutation(
                        np.asarray(self.x_table),
                        num_clusters=cfg.model.block_pool_clusters,
                        seed=cfg.train.seed,
                    )
                self.log.log("block_cluster",
                             order=cfg.model.block_pool_order,
                             seconds=time.perf_counter() - t0)
            from ..ops.hub_pool import resolve_pool_matrix_dtype

            pool_dtype = resolve_pool_matrix_dtype(
                cfg.model.pool_matrix_dtype, self.table_rows, "block")
            mats = []
            for nbrs, w in tables[:n_block]:
                bp, stats = bsp.build_block_pool(
                    np.asarray(nbrs), np.asarray(w), self._block_perm,
                    valid_limit=self.valid_limit,
                    block_size=cfg.model.block_pool_block_size,
                    max_blocks=cfg.model.block_pool_max_blocks,
                )
                self.log.log("block_pool", **stats)
                if stats["dropped_mass"] > cfg.model.block_pool_max_dropped_mass:
                    # Clustering found no exploitable structure; the tiled
                    # matrix would distort pooling — fall back to gather.
                    self.log.log("block_pool_fallback",
                                 dropped_mass=stats["dropped_mass"])
                    mats = []
                    break
                if bp.a_blocks.dtype != pool_dtype:
                    # Quantize AFTER the bf16 scatter build (same rationale
                    # as the dense path: scatter-add into f8 loses additions).
                    bp = bp._replace(a_blocks=_cast_matrix(bp.a_blocks,
                                                           pool_dtype))
                if self.mesh is not None:
                    from jax.sharding import NamedSharding, PartitionSpec as P

                    r_rows = int(bp.a_blocks.shape[0])
                    model_size = self.mesh.shape[self.cfg.mesh.model_axis]
                    if r_rows % model_size == 0:
                        row4 = NamedSharding(self.mesh,
                                             P("model", None, None, None))
                        row2 = NamedSharding(self.mesh, P("model", None))
                        bp = bp._replace(
                            a_blocks=jax.device_put(bp.a_blocks, row4),
                            col_idx=jax.device_put(bp.col_idx, row2),
                        )
                mats.append(bp)
            self.pool_mats = tuple(mats)
            return
        if n_dense:
            from ..ops.hub_pool import resolve_pool_matrix_dtype

            pool_dtype = resolve_pool_matrix_dtype(
                cfg.model.pool_matrix_dtype, self.table_rows, "dense")
            mats = []
            for nbrs, w in tables[:n_dense]:
                a = pinsage.build_pool_matrix(
                    nbrs, w, num_cols=self.table_rows,
                    valid_limit=self.valid_limit,
                    # Keep the [N, N] scatter output row-sharded under a
                    # mesh (GSPMD otherwise replicates it per device).
                    out_sharding=(self._row_sharding
                                  if self.mesh is not None else None),
                )
                if a.dtype != pool_dtype:
                    # Quantize AFTER the scatter build (scatter-add into f8
                    # would lose additions); transient peak is A in both
                    # dtypes (10.5 GB at ML-25M scale — fits v5e HBM).
                    a = _cast_matrix(a, pool_dtype)
                if self.mesh is not None:
                    a = jax.device_put(a, self._row_sharding)
                mats.append(a)
            self.pool_mats = tuple(mats)

    # ---- train step -------------------------------------------------------
    #
    # The whole inner loop — negative sampling (random + hard-negative walks),
    # forward, loss, grads, Adam — lives inside ONE jitted program that scans
    # over a block of steps. One dispatch per block instead of 3+ per step:
    # host/device round-trips (expensive over the TPU tunnel) amortize away,
    # and params/opt-state buffers are donated across the scan.

    @partial(
        jax.jit,
        static_argnames=("self", "num_hard"),
        donate_argnames=("params", "opt_state"),
    )
    def _run_steps(
        self,
        params,
        opt_state,
        x_table,               # [N, F] — explicit arg so large tables are
        nbrs_l: tuple,         # never baked into the program as constants
        w_l: tuple,
        pool_mats: tuple,      # per-layer [N, N] dense pool matrices, or ()
        graph,                 # DeviceGraph — arg for the same reason: the
                               # E-sized CSR must not become program constants
        q_blk: jax.Array,      # [S, B] int32
        p_blk: jax.Array,      # [S, B] int32
        key: jax.Array,
        lr: jax.Array,
        epoch: jax.Array,      # traced scalar — a static epoch would force a
                               # full (minutes-long, over the tunnel) recompile
                               # EVERY epoch; only num_hard (a shape) is static
        num_hard: int,
    ):
        cfg = self.cfg
        num_rand = min(cfg.train.num_negative_samples, self.data.num_movies)
        # Dense-matmul fast path only for plain [N, N] matrices; a full set
        # of HubPool/BlockPool operators (hub_pool_final_layer) must route
        # through pooled_forward_batch's structured-pool dispatch.
        use_dense = (len(pool_mats) == cfg.model.num_layers
                     and all(isinstance(pm, jax.Array) for pm in pool_mats))

        def one_step(carry, inputs):
            params, opt_state = carry
            q, p, k = inputs
            k_neg, k_hard, k_drop = jax.random.split(k, 3)
            b = q.shape[0]

            rand_negs = negative.sample_random_negatives(
                k_neg, self.data.num_movies, num_rand
            )
            if num_hard > 0:
                hard_negs = negative.sample_hard_negatives(
                    graph, q, k_hard, num_hard, self.data.num_movies,
                    num_walks=100, walk_length=cfg.walk.walk_length,
                    min_rank=cfg.train.hard_neg_min_rank,
                    max_rank=cfg.train.hard_neg_max_rank,
                    n_iters=self.n_iters,
                )
            else:
                hard_negs = None

            def loss_fn(params):
                nodes = [q, p, rand_negs]
                if num_hard > 0:
                    nodes.append(hard_negs.reshape(-1))
                all_nodes = jnp.concatenate(nodes)
                if cfg.train.train_path == "mlp":
                    x = jnp.take(x_table, all_nodes, axis=0)
                    emb = pinsage.mlp_forward(params, x, self.compute_dtype)
                elif use_dense:
                    emb = pinsage.pooled_forward_batch_dense(
                        params, x_table, list(pool_mats), all_nodes,
                        dtype=self.compute_dtype,
                        dropout_rate=cfg.model.dropout, dropout_rng=k_drop,
                    )
                else:
                    emb = pinsage.pooled_forward_batch(
                        params, x_table, list(nbrs_l), list(w_l), all_nodes,
                        valid_limit=self.valid_limit, dtype=self.compute_dtype,
                        dropout_rate=cfg.model.dropout, dropout_rng=k_drop,
                        aggregator=cfg.model.aggregator_type,
                        pool_mats=pool_mats,
                        gather_impl=self.gather_impl,
                    )
                q_emb, p_emb = emb[:b], emb[b : 2 * b]
                r_emb = emb[2 * b : 2 * b + num_rand]
                h_emb = (
                    emb[2 * b + num_rand :].reshape(b, num_hard, -1)
                    if num_hard > 0 else None
                )

                kind = cfg.train.loss if cfg.train.train_path != "mlp" else "cosine"
                if kind == "cosine":
                    return losses.cosine_objective(q_emb, p_emb)
                if kind == "batch_hard":
                    return losses.batch_hard_triplet_loss(q_emb, p_emb, cfg.train.margin)
                if kind == "max_margin":
                    return losses.shared_pool_max_margin_loss(
                        q_emb, p_emb, r_emb, cfg.train.margin
                    )
                if kind == "nce":
                    return losses.nce_loss(
                        q_emb, p_emb, r_emb, h_emb,
                        temperature=cfg.train.nce_temperature,
                    )
                return losses.curriculum_loss(
                    q_emb, p_emb, r_emb, h_emb, epoch,
                    margin=cfg.train.margin, max_epochs=cfg.train.epochs,
                    hard_negative_factor=cfg.train.hard_neg_factor,
                )

            loss, grads = jax.value_and_grad(loss_fn)(params)
            params, opt_state = optim.adam_update(grads, opt_state, params, lr)
            return (params, opt_state), loss

        s = q_blk.shape[0]
        keys = jax.random.split(key, s)
        (params, opt_state), step_losses = jax.lax.scan(
            one_step, (params, opt_state), (q_blk, p_blk, keys)
        )
        return params, opt_state, step_losses

    # ---- epoch driver -----------------------------------------------------

    def _epoch_pairs(self, rng: np.random.Generator) -> np.ndarray:
        pairs = self.train_pairs
        cap = self.cfg.train.max_pairs_per_epoch
        if cap is not None and pairs.shape[0] > cap:
            sel = rng.choice(pairs.shape[0], size=cap, replace=False)
            pairs = pairs[sel]
        else:
            pairs = pairs[rng.permutation(pairs.shape[0])]
        # Pad to a whole number of fixed-size batches (wrap-around) so the
        # jitted step sees one static batch shape. Under a mesh the batch
        # must divide the data axis.
        bsz = min(self.cfg.train.batch_size, max(pairs.shape[0], 1))
        if self.mesh is not None:
            bsz = max(bsz - bsz % self._data_size, self._data_size)
        pad = (-pairs.shape[0]) % bsz
        if pad:
            reps = 2 + pad // max(pairs.shape[0], 1)
            pairs = np.concatenate([pairs] * reps, axis=0)[: pairs.shape[0] + pad]
        return pairs.reshape(-1, bsz, 2)

    def train_epoch(self, epoch: int) -> dict[str, float]:
        cfg = self.cfg
        refresh = cfg.train.refresh_neighborhoods_every
        refresh_s = 0.0
        if self.nbr_tables is None or (refresh and epoch % refresh == 0):
            t0 = time.perf_counter()
            self.refresh_neighborhoods()
            refresh_s = time.perf_counter() - t0
            self.log.log("neighborhoods", epoch=epoch, seconds=refresh_s)

        np_rng = np.random.default_rng(cfg.train.seed + 1000 + epoch)
        batches = self._epoch_pairs(np_rng)
        num_hard = (
            negative.curriculum_num_hard(epoch, cfg.train.max_hard_negatives)
            if cfg.train.loss in ("curriculum", "nce")
            and cfg.train.train_path != "mlp"
            else 0
        )
        nbrs_l = tuple(t[0] for t in self.nbr_tables)
        w_l = tuple(t[1] for t in self.nbr_tables)

        # Steps are scanned in fixed-size blocks inside one jitted program;
        # pad the step count up to a whole number of blocks (wrap-around)
        # so only 1-2 program shapes ever compile.
        s_total = batches.shape[0]
        block = min(self.steps_per_call, s_total)
        pad_steps = (-s_total) % block
        if pad_steps:
            batches = np.concatenate([batches, batches[:pad_steps]], axis=0)
        q_all = jnp.asarray(batches[:, :, 0], jnp.int32)
        p_all = jnp.asarray(batches[:, :, 1], jnp.int32)
        if self.mesh is not None:
            q_all = jax.device_put(q_all, self._batch_sharding)
            p_all = jax.device_put(p_all, self._batch_sharding)

        losses_dev = []
        t0 = time.perf_counter()
        t_after_first = None
        for s0 in range(0, batches.shape[0], block):
            self.rng, k = jax.random.split(self.rng)
            self.params, self.opt_state, step_losses = self._run_steps(
                self.params, self.opt_state, self.x_table, nbrs_l, w_l,
                self.pool_mats, self.graph,
                q_all[s0 : s0 + block], p_all[s0 : s0 + block],
                k, jnp.float32(self.plateau.lr), jnp.float32(epoch),
                num_hard=num_hard,
            )
            losses_dev.append(step_losses)
            if t_after_first is None:
                # Host materialization is the only hard sync on the tunnel
                # backend (block_until_ready can return early there).
                np.asarray(step_losses)
                t_after_first = time.perf_counter()
        all_losses_list = [np.asarray(l) for l in losses_dev]
        t_end = time.perf_counter()

        all_losses = np.concatenate(all_losses_list)[:s_total]
        bsz = int(batches.shape[1])
        n_timed_steps = batches.shape[0] - block
        timed_s = t_end - t_after_first
        exps = (
            bsz * n_timed_steps / timed_s if n_timed_steps and timed_s > 0
            else bsz * block / max(t_after_first - t0, 1e-9)
        )
        return {
            "loss": float(all_losses.mean()),
            "examples_per_sec": exps,
            # Mean over the timed steps (per-step medians aren't observable:
            # steps run inside one scanned program, so only block boundaries
            # are host-visible). Named _avg accordingly.
            "step_ms_avg": (
                timed_s / n_timed_steps * 1e3 if n_timed_steps else float("nan")
            ),
            "num_hard": num_hard,
            # Wall breakdown (VERDICT r4 #3): refresh_seconds makes the
            # table-resample/pool-rebuild cost visible next to the step
            # throughput it is otherwise hidden behind — end-to-end
            # wall-per-epoch is refresh_seconds + step wall (+ compiles on
            # the first epoch of each program shape).
            "refresh_seconds": round(refresh_s, 2),
            "step_wall_seconds": round(t_end - t0, 2),
        }

    # ---- inference / eval -------------------------------------------------

    @partial(jax.jit, static_argnames=("self",))
    def _embed_all(self, params, x_table, nbrs_l: tuple, w_l: tuple,
                   pool_mats: tuple) -> jax.Array:
        if self.cfg.train.train_path == "mlp":
            # The shipped-loop parity mode trains only the MLP-path weights
            # (input_proj / conv self / output_proj); evaluating through the
            # pooled forward would score never-trained update weights. The
            # reference's evaluate embeds via the same MLP path
            # (run.py:157-165).
            emb = pinsage.mlp_forward(
                params, x_table[: self.data.num_movies], self.compute_dtype
            )
            return emb
        if (len(pool_mats) == self.cfg.model.num_layers
                and all(isinstance(pm, jax.Array) for pm in pool_mats)):
            emb = pinsage.pooled_forward_dense(
                params, x_table, list(pool_mats), dtype=self.compute_dtype,
            )
        else:
            emb = pinsage.pooled_forward(
                params, x_table, list(nbrs_l), list(w_l),
                valid_limit=self.valid_limit, dtype=self.compute_dtype,
                aggregator=self.cfg.model.aggregator_type,
                pool_mats=pool_mats,
                gather_impl=self.gather_impl,
            )
        return emb[: self.data.num_movies]

    def movie_embeddings(self, params=None) -> jax.Array:
        """[num_movies, embed_dim] via the full pooled forward (the
        get_embeddings equivalent, model/pinsage.py:253-279). One jitted
        program over the whole corpus."""
        if self.nbr_tables is None:
            self.refresh_neighborhoods()
        params = params if params is not None else self.params
        nbrs_l = tuple(t[0] for t in self.nbr_tables)
        w_l = tuple(t[1] for t in self.nbr_tables)
        return self._embed_all(params, self.x_table, nbrs_l, w_l, self.pool_mats)

    def evaluate(self, pairs: np.ndarray | None = None, params=None) -> dict[str, float]:
        pairs = self.test_pairs if pairs is None else pairs
        emb = self.movie_embeddings(params)
        if pairs is None or pairs.shape[0] == 0:
            # No interaction-derived pairs: genre-similarity fallback
            # (reference run.py:184-237 falls back to run.py:254-328).
            from ..evaluation.fallback import evaluate_genre_similarity

            out = evaluate_genre_similarity(
                emb, self.data.genres, k_values=self.cfg.eval.k_values,
                mrr_scale=self.cfg.eval.mrr_scale, seed=self.cfg.train.seed,
            )
            out["fallback"] = "genre_similarity"
            return out
        return eval_metrics.evaluate_embeddings(
            emb, pairs, k_values=self.cfg.eval.k_values,
            mrr_scale=self.cfg.eval.mrr_scale,
        )

    # ---- checkpoint / resume ----------------------------------------------

    def _ckpt_tree(self):
        return {
            "params": self.params,
            "opt": self.opt_state._asdict(),
            "rng": self.rng,
        }

    def save_checkpoint(self, path: str, tag: str = "last") -> None:
        # Multi-host: params/opt are replicated, so ONLY the coordinator
        # writes (N identical concurrent writers would race on a shared FS);
        # the barrier keeps every process from reading — or exiting — before
        # the write lands. fit()'s loop is deterministic across processes
        # (same data, seeds, val metric), so all ranks reach this together.
        from ..parallel import mesh as mesh_mod

        if mesh_mod.is_coordinator():
            meta = {
                "epoch": self.epoch,
                "best_metric": self.best_metric,
                "plateau": self.plateau._asdict(),
                "config": self.cfg.to_dict(),
                "tag": tag,
            }
            ckpt.save_pytree(path, self._ckpt_tree(), meta)
        mesh_mod.barrier(f"ckpt:{tag}")

    def load_checkpoint(self, path: str) -> None:
        tree = ckpt.load_pytree(path, self._ckpt_tree())
        meta = ckpt.load_meta(path)
        self.params = tree["params"]
        self.opt_state = optim.AdamState(**tree["opt"])
        self.rng = tree["rng"]
        self.epoch = int(meta["epoch"])
        self.best_metric = float(meta["best_metric"])
        self.plateau = optim.PlateauState(**meta["plateau"])

    # ---- main loop --------------------------------------------------------

    def fit(self, resume_from: str | None = None) -> dict[str, Any]:
        cfg = self.cfg
        if resume_from and os.path.exists(
            resume_from if resume_from.endswith(".npz") else resume_from + ".npz"
        ):
            self.load_checkpoint(resume_from)
            self.log.log("resume", epoch=self.epoch)

        stopper = optim.EarlyStopping(cfg.eval.patience)
        stopper.best = self.best_metric
        os.makedirs(cfg.paths.checkpoint_dir, exist_ok=True)
        best_path = os.path.join(cfg.paths.checkpoint_dir, "best_model")
        last_path = os.path.join(cfg.paths.checkpoint_dir, "last_model")
        history = []
        best_written = False  # did THIS fit() call write best_model?

        start = self.epoch
        for epoch in range(start, cfg.train.epochs):
            self.epoch = epoch
            t0 = time.perf_counter()
            stats = self.train_epoch(epoch)
            stats["epoch_seconds"] = time.perf_counter() - t0

            val_metric = None
            if cfg.eval.eval_every and (epoch + 1) % cfg.eval.eval_every == 0 \
                    and self.val_pairs.shape[0] > 0:
                vp = self.val_pairs
                cap = cfg.eval.max_val_pairs
                if cap is not None and vp.shape[0] > cap:
                    sel = np.random.default_rng(cfg.train.seed + 7).choice(
                        vp.shape[0], size=cap, replace=False)
                    vp = vp[sel]
                val = self.evaluate(vp)
                # Smallest configured k (the reference tracks HR@10 but
                # k_values is a knob here — don't KeyError on custom sets).
                val_metric = val[f"hit_rate@{min(cfg.eval.k_values)}"]
                stats.update({f"val_{k}": v for k, v in val.items()})

            # Plateau monitor: train loss (min-mode, default) or the val
            # metric (max-mode via negation — the reference's intended
            # ReduceLROnPlateau(mode='max') wiring, run.py:120-122; its
            # shipped loop never steps the scheduler, see PARITY.md). With
            # the val monitor, epochs without validation leave the schedule
            # untouched.
            if cfg.train.lr_plateau_monitor == "val_metric":
                if val_metric is not None:
                    self.plateau = optim.plateau_step(
                        self.plateau, -float(val_metric),
                        factor=cfg.train.lr_plateau_factor,
                        patience=cfg.train.lr_plateau_patience,
                    )
            else:
                self.plateau = optim.plateau_step(
                    self.plateau, stats["loss"],
                    factor=cfg.train.lr_plateau_factor,
                    patience=cfg.train.lr_plateau_patience,
                )
            stats["lr"] = self.plateau.lr
            self.log.log_epoch(epoch, **stats)
            history.append(stats)

            self.epoch = epoch + 1
            self.save_checkpoint(last_path, tag="last")
            if val_metric is not None and val_metric > self.best_metric:
                self.best_metric = val_metric
                self.save_checkpoint(best_path, tag="best")
                best_written = True
            if val_metric is not None and stopper.update(val_metric):
                self.log.log("early_stop", epoch=epoch)
                break

        return {
            "history": history,
            "best_metric": self.best_metric,
            # Set only when this run wrote best_model — callers that reload
            # the "best" checkpoint must gate on this, not on best_metric
            # (a resumed run restores best_metric > -inf without writing).
            "best_path": best_path if best_written else None,
        }
