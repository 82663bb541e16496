"""Typed configuration for the TPU-native PinSage engine.

Single source of truth replacing the reference's two overlapping config systems
(module-level constants in ``config.py:1-65`` and per-script argparse flags,
see reference ``run.py:500-510``, ``main.py:12-60``, ``inference.py:173-230``).

Every knob from the reference ``config.py`` is present — including the flags the
reference defines but never reads (``USE_DATA_SUBSET``/``DATA_SUBSET_FRACTION``
``config.py:64-65``, ``DROPOUT``/``AGGREGATOR_TYPE``/``USE_BATCH_NORM``
``config.py:23-25``, ``EVAL_EVERY`` ``config.py:45``, ``HARD_NEG_FACTOR``
``config.py:38``, ``NUM_WORKERS`` ``config.py:39``). Here they are honored.
"""

from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any, Sequence


@dataclass
class DataConfig:
    """Dataset ingest settings (reference ``config.py:7-9,63-65``)."""

    data_dir: str = "./data/ml-25m"
    min_interactions: int = 5          # min ratings per user (dataset.py:56-58)
    use_data_subset: bool = True       # honored here (ref run.py:48 hardcodes 0.30)
    data_subset_fraction: float = 0.30
    # "synthetic" generates a MovieLens-shaped workload on the fly (no files
    # needed); "movielens" reads movies/ratings/tags/links CSVs.
    source: str = "movielens"
    # Synthetic workload scale (used when source == "synthetic").
    synthetic_num_movies: int = 4000
    synthetic_num_users: int = 12000
    synthetic_num_ratings: int = 400_000
    # Corpus seed for the synthetic generator. -1 = follow train.seed (the
    # historical behavior). Pin it when sweeping train.seed so every arm
    # trains on the SAME corpus — otherwise changing train.seed silently
    # changes the dataset too and cross-arm metric deltas confound
    # (corpus + init) with the thing being A/B'd.
    synthetic_seed: int = -1


@dataclass
class GraphConfig:
    """Graph construction (reference ``config.py:11-13``)."""

    use_bipartite_graph: bool = True
    similarity_threshold: int = 5      # co-occurrence cutoff (graph_builder.py:59)


@dataclass
class FeatureConfig:
    """Feature pipeline (reference ``config.py:15-17``, ``data/feature_extractor.py``)."""

    feature_dim: int = 128
    use_visual_features: bool = False
    # True reproduces the reference's StandardScaler-before-PCA
    # (feature_extractor.py:93-95); False (default) is center-only PCA, which
    # preserves the genre/content signal — see graph/features.standardize_pca.
    standardize: bool = False
    genre_weight: float = 2.0          # feature_extractor.py:118
    year_norm: float = 2020.0          # feature_extractor.py:136
    title_tfidf_max_features: int = 100  # feature_extractor.py:153
    title_tfidf_min_df: int = 5
    tag_tfidf_max_features: int = 200    # feature_extractor.py:188
    tag_tfidf_min_df: int = 3


@dataclass
class ModelConfig:
    """Model shape (reference ``config.py:19-25``, ``model/pinsage.py:155-184``)."""

    hidden_dim: int = 256
    embed_dim: int = 128
    num_layers: int = 2
    aggregator_type: str = "importance"  # aggregators.KINDS: mean|weighted|
    # attention|max|importance|importance_transform
    # "he_zero_bias" (default) or "torch_default" (reference nn.Linear parity;
    # collapses at init — see models/pinsage._linear_init).
    init_style: str = "he_zero_bias"
    dropout: float = 0.2
    use_batch_norm: bool = False
    # Pooling implementation: "dense" turns importance pooling into a
    # row-stochastic [N, N] bf16 matmul on the MXU (~50x faster than the
    # irregular [B, K, D] row gather on TPU, measured); "hybrid" uses the
    # dense matmul for the full-graph layers 0..L-2 only (one [N, N] bf16
    # matrix instead of L — the memory that matters at ML-25M scale) and the
    # cheap batch-restricted gather for the final layer; "gather" keeps the
    # gather form everywhere (O(N*K) memory — required for very large
    # corpora); "hub" factors each full-graph pooling matrix into a dense
    # [N, head] slab over the top-mass hub columns + a per-row top-R sparse
    # residual (ops/hub_pool.py) — O(N * head) memory, the >64k-row path
    # (measured: drops 0.5% of pooling mass where the best block tiling
    # dropped 9.7%, scripts/block_order_probe.py); "block" tiles the
    # matrices into clustered [bs, cs] blocks (ops/block_sparse.py);
    # "auto" picks dense <= dense_pool_max_rows rows, hybrid <=
    # dense_pool_hybrid_max_rows, hub above that (with the final layer
    # hubbed too when the slabs fit — auto_hub_final below); when a hub
    # build would drop too much pooling weight the trainer first doubles
    # the residual once (the 256k escape — residual costs bandwidth, not
    # slab HBM, RESULTS.md), then falls back hub -> block -> gather.
    pool_impl: str = "auto"
    dense_pool_max_rows: int = 32768
    # Hybrid band of the auto ladder. Round 5 collapsed it (== dense max):
    # auto now selects the hub rung above 32k rows. Three-seed 59k quality
    # table (seeds 42/43/44, RESULTS.md): hubf HR@100 0.140/0.147/0.140 —
    # tied-or-best on EVERY seed; hub 0.141/0.138/0.133; hybrid erratic
    # (0.103 at seed 42 — a depth collapse — vs 0.141 at seed 43). hubf
    # also steps 1.2-1.4x faster (24.3k vs ~18-21k ex/s). The shipped
    # default is now the same form as the recorded at-scale headline
    # (bench.py at_scale "hubf"). Raise back to 65536 to restore the
    # exact-hybrid band of rounds 2-4; pool_impl="hybrid" selects it
    # explicitly.
    dense_pool_hybrid_max_rows: int = 32768
    # Hub pooling shape knobs (pool_impl="hub"/auto-at-scale).
    # head: dense head columns (by pooling mass). 0 = auto-scale with the
    # corpus — clip(N/8, 4096, cap) where the cap is 32 KB of slab per row
    # (16384 cols bf16, 32768 cols float8 — ops/hub_pool.auto_head);
    # measured dropped mass at residual=8: 0.5% @ 16k/head4096, 0.7% @
    # 59k/head8192 (scripts/block_order_probe.py) vs 6.2% with a fixed
    # 4096 head at 59k.
    hub_pool_head: int = 0
    hub_pool_residual: int = 8           # per-row top non-head entries kept
    # Use the hub factorization for the FINAL (batch-restricted) layer too:
    # the batch apply reads a [B, head] slab row-gather (contiguous rows) +
    # a [B, residual, D] gather instead of the [B, K, D] scattered row
    # gather — the latter is ~5 ms of the 22.9 ms 59k step (RESULTS.md
    # bottleneck breakdown). Costs the hub's ~1% dropped pooling mass on
    # that layer as well. False = final layer keeps the exact K-neighbor
    # gather (the pre-round-4 behavior). HBM note: this builds a SECOND
    # [N, head] slab — at 256k rows two 8.6 GB bf16 slabs exceed v5e HBM
    # (measured OOM, RESULTS.md); bf16 fits up to ~131k rows at the 16384
    # auto head. In f8 at head 16384 the pair is 2 x 4.3 GB and FITS at
    # 256k (measured round 5: 106.8 ms/step — the fastest 256k form — at
    # 5.19%/layer dropped, so the gate escalates unless the residual or
    # head is tuned).
    hub_pool_final_layer: bool = False
    # When pool_impl=auto resolves to the hub rung, ALSO hub the final
    # layer (hub_pool_final_layer semantics) if the full slab set fits
    # auto_hub_final_max_bytes. Measured at 59k: hubf 19.3 ms/step vs hub
    # 24.3 / hybrid 28.4; at 128k: 50.4 vs 53.4 (RESULTS.md). The
    # per-layer dropped-mass gate still protects quality (escalation /
    # fallback applies to the final layer too). Set false to keep auto on
    # the exact-final-layer hub form.
    auto_hub_final: bool = True
    # Capacity budget for that auto decision: sum of [N, head] slab bytes
    # over all layers. 10 GiB admits the measured-fitting pairs (2 x
    # 4.3 GB at <=131k bf16) and rejects the measured-OOM ones (2 x
    # 8.6 GB at 256k) with headroom for tables + activations on 16 GiB
    # v5e.
    auto_hub_final_max_bytes: int = 10 << 30
    # Fall back (hub -> block under auto, else gather) when the hub
    # factorization would drop more than this fraction of pooling weight.
    # Negative = inherit block_pool_max_dropped_mass (one shared threshold
    # governs every lossy pooling form unless tuned separately).
    hub_pool_max_dropped_mass: float = -1.0
    # Block-sparse pooling shape knobs (pool_impl="block"/auto-at-scale).
    block_pool_block_size: int = 512
    block_pool_max_blocks: int = 32      # col blocks kept per row block
    block_pool_clusters: int = 0         # 0 = auto (~N/256, capped 4096)
    # Node ordering for the tiling: "mass" sorts by total pooling weight
    # per column (concentrates the hub columns every row needs into the
    # leading blocks — measured dropped mass 0.031 at 59k vs 0.373 for
    # feature k-means, scripts/block_order_probe.py); "feature" is the
    # legacy content-k-means order.
    block_pool_order: str = "mass"
    # Fall back to gather pooling when the clustered tiling would drop more
    # than this fraction of total pooling weight (graph has no community
    # structure the clustering can exploit).
    block_pool_max_dropped_mass: float = 0.05
    # Storage dtype of the dense pool matrices. The hybrid/dense step is
    # HBM-bound on reading A (7 GB bf16 at ML-25M scale, touched twice per
    # step: A @ h forward, A^T @ g backward) — "float8_e4m3fn" halves that
    # traffic. Pool weights are coarse visit-count fractions (100 walks), so
    # e4m3's ~6% relative step is below the sampling noise; rows are
    # renormalized before quantization. For hub pooling f8 is a CAPACITY
    # lever too: auto_head's byte cap admits twice the head columns, so at
    # 256k rows the head is N/8 = 32768 (vs bf16's N/16) at the same 8.6 GB
    # slab footprint — measured (round-5 256k ladder): 0.65% dropped mass
    # at residual=8, 139 ms/step, vs bf16's 5.17% at r8 forcing the x2
    # escalation to 193 ms. "auto" (default) selects f8 exactly there —
    # hub rung, auto head, bf16 cap binding (n > 131072) — and bf16
    # everywhere else (same-head f8 measured speed-neutral: the step is
    # not slab-read-bound). ops/hub_pool.resolve_pool_matrix_dtype.
    pool_matrix_dtype: str = "auto"  # auto | bfloat16 | float8_e4m3fn
    # Gather-form pooling implementation used wherever pooling is NOT a dense
    # matrix (the final hybrid layer's batch gather, pool_impl="gather", block
    # fallback): "xla" = gather + einsum (materializes [B, K, D] in HBM);
    # "pallas" = fused DMA-gather kernel (ops/pallas/pool.py). "auto" = XLA
    # everywhere: the kernel was MEASURED inside the real 59k train step on
    # silicon (round 4, RESULTS.md) at 2.4x SLOWER than the XLA formulation
    # — the Mosaic sublane rule forces an 8/16-row DMA window per neighbor
    # (8-16x read amplification), which loses to XLA's batched scattered
    # gather. The kernel remains an explicit "pallas" opt-in for future
    # shapes/hardware (through the tunnel it additionally needs
    # MRE_TUNNEL_PALLAS=1; off-TPU it runs interpret-mode only).
    gather_impl: str = "auto"
    # Which nodes are eligible as pooled neighbors. The reference passes only
    # movie features to pooling, so user-node neighbors are silently dropped as
    # out-of-range indices (model/pinsage.py:124). "movies_only" reproduces
    # that; "all" pools over every node (users get zero features, matching
    # dataset.py:260).
    pool_nodes: str = "movies_only"


@dataclass
class WalkConfig:
    """Random-walk sampling (reference ``config.py:27-30``)."""

    walk_length: int = 2
    num_walks: int = 100
    num_neighbors: int = 50
    # "movies": count only movie-node visits when ranking neighborhoods
    # (PinSage-paper semantics — items neighbor items). "all": count every
    # visited node like the reference (whose pooling then drops user ids,
    # wasting top-K slots; see sampling/random_walk.importance_neighborhoods).
    count_nodes: str = "movies"
    # Neighborhood ranking strategy: "random_walk" (visit-count importance,
    # the PinSage default) or "ppr" (deterministic approximate Personalized
    # PageRank top-K — the reference ships this as dead code at
    # utils/random_walk.py:144-228; here it is a working, MEASURED option;
    # see sampling/ppr.py). RECOMMENDATION (round 5, RESULTS.md): at 59k
    # scale PPR beat the walk tables at EVERY k at both the 3-epoch and
    # 10-epoch budgets (+5.7% rel. HR@100, +13% MRR at 10 epochs) with
    # ZERO per-epoch refresh cost (tables are deterministic, built once).
    # The default stays random_walk for reference parity and because the
    # O(batch * E) PPR build is a real one-time cost on huge graphs — but
    # for <=1M-item corpora, `--set walk.strategy=ppr` is the measured
    # best-quality setting.
    strategy: str = "random_walk"
    ppr_alpha: float = 0.15
    ppr_iterations: int = 10
    # Sources per PPR chunk. Each chunk materializes an O(batch * E) f32
    # edge-message transient — at ML-1M (~2M directed edges) batch=512 costs
    # a ~4 GB transient; shrink this for bigger graphs (or use the default
    # random_walk strategy, which is the at-scale path).
    ppr_batch: int = 512


@dataclass
class TrainConfig:
    """Training loop (reference ``config.py:32-41``)."""

    batch_size: int = 512
    epochs: int = 10
    learning_rate: float = 1e-3
    margin: float = 0.1
    num_negative_samples: int = 500
    hard_neg_factor: float = 2.0
    # Host-side ingest parallelism: native ratings-CSV parser threads and
    # concurrent movies/ratings/tags loads (the reference declares NUM_WORKERS
    # but never uses it, config.py:39 — honored here, graph/dataset.py).
    num_workers: int = 4
    val_ratio: float = 0.1
    test_ratio: float = 0.2
    # Cap on positive pairs per epoch; the reference subsamples <=1000
    # (train.py:40-41). None = use all pairs.
    max_pairs_per_epoch: int | None = 1000
    # Curriculum hard negatives (negative_sampler.py:101-124): from epoch >= 1,
    # num_hard = min(epoch, max_hard_negatives).
    max_hard_negatives: int = 6
    hard_neg_min_rank: int = 2000      # negative_sampler.py:44
    hard_neg_max_rank: int = 5000
    # "pinsage": full importance-pooling graph forward (the documented design,
    # README:130-168). "mlp": the reference's shipped simplified loop
    # (train.py:72-78, no graph, cosine objective).
    train_path: str = "pinsage"
    # Loss on the pinsage path: "nce" (sampled softmax, default — see
    # models/losses.nce_loss for why) | "max_margin" | "batch_hard" |
    # "curriculum" (reference parity, model/loss.py).
    loss: str = "nce"
    nce_temperature: float = 0.1
    # Neighborhood tables are resampled every N epochs (0 = sample once and
    # keep). The reference samples fresh on every get_embeddings call
    # (model/pinsage.py:271-275); per-epoch refresh is the TPU-friendly
    # equivalent that keeps the train step a pure jitted program.
    refresh_neighborhoods_every: int = 1
    # LR plateau schedule (reference run.py:117-122 ReduceLROnPlateau).
    lr_plateau_factor: float = 0.5
    lr_plateau_patience: int = 2
    # What the plateau monitors: "train_loss" (min-mode, default — always
    # available, steps every epoch) or "val_metric" (max-mode on val
    # HR@min(k), the reference's *intent*: run.py:120-122 constructs
    # ReduceLROnPlateau(mode='max') for the val metric but its shipped
    # train() never calls scheduler.step(), so ours is a functioning
    # superset of dead code either way; see PARITY.md deviations).
    # With "val_metric" the schedule only steps on epochs where validation
    # ran (eval.eval_every).
    lr_plateau_monitor: str = "train_loss"
    seed: int = 42                      # reference run.py:514 set_seed(42)
    # bfloat16 matmuls on the MXU; params and loss stay f32.
    compute_dtype: str = "bfloat16"


@dataclass
class EvalConfig:
    """Evaluation (reference ``config.py:43-46``)."""

    k_values: tuple[int, ...] = (10, 50, 100, 500)
    eval_every: int = 1
    patience: int = 3
    mrr_scale: float = 100.0           # evaluation.py:69 — 1/(rank/100)
    # Co-rated item-item eval pairs: min rating threshold (run.py:198).
    corated_min_rating: float = 4.0
    # Cap on PER-EPOCH validation pairs (fixed-seed subsample). At ML-25M
    # scale full validation (379k pairs x 59k corpus) costs more wall clock
    # than the training epoch itself; 50-100k pairs gives the same metric to
    # ~3 decimals. None = evaluate every validation pair. Final/test
    # evaluation is never capped.
    max_val_pairs: int | None = None


@dataclass
class SearchConfig:
    """ANN retrieval (reference ``config.py:48-53``)."""

    # exact | lsh | lsh_rerank | ivf | sharded_exact | sharded_ivf
    # ("lsh_rerank" = lsh with a default shortlist of 100 when lsh_rerank
    # below is 0; sharded_* distribute over the device mesh).
    search_method: str = "exact"
    lsh_bits: int = 256
    lsh_tables: int = 16
    # >0: re-score that many min-Hamming candidates with exact squared-L2
    # distances (shortlist-then-rerank, same fused program; measured at 59k:
    # recall@10 0.384 -> 0.975 at 0.21 ms/query — RESULTS.md). 0 = plain
    # Hamming ranking, FAISS IndexLSH parity (the default, for surface
    # parity; production should set 100 — benchmark mode reports both rows).
    lsh_rerank: int = 0
    ivf_partitions: int = 100
    # Weak-AND candidate cap: >0 bounds each probed list to k * factor
    # centroid-nearest rows (latency/recall knob); 0 scans full probed lists
    # — the reference's *effective* behavior (its IVF_FACTOR config.py:53 is
    # stored by WeakANDIndex but never used, nearest_neighbors.py:86).
    ivf_factor: int = 0
    ivf_nprobe: int = 20               # nearest_neighbors.py:134 min(partitions, 20)
    # Inverted lists are size-capped at ceil(factor * N / partitions) at
    # build (overflow spills to the next-nearest centroid). Bounds the
    # per-probe scan budget under skewed k-means — without it the largest
    # cluster sets the candidate-gather size (multi-GB at 59k). 0 disables.
    ivf_balance_factor: float = 4.0


@dataclass
class ServeConfig:
    """Batched recommendation server (retrieval/server.py). New — the
    reference has no serving runtime (closest: demo.py's interactive menu)."""

    host: str = "127.0.0.1"
    port: int = 8321
    max_batch: int = 64          # requests packed into one device search
    max_wait_ms: float = 2.0     # batching linger before a partial batch runs
    max_k: int = 100             # static top-k searched per program shape


@dataclass
class MeshConfig:
    """TPU device-mesh layout. New — the reference is single-device
    (run.py:87); see SURVEY.md §2b."""

    data_axis: str = "data"
    model_axis: str = "model"
    # None = use all local devices on the data axis.
    mesh_shape: tuple[int, int] | None = None
    # Shard node feature / embedding tables by row across the model axis.
    shard_tables: bool = False
    # Row-shard the O(E) walk CSR over the model axis too (with
    # shard_tables): in-step hard-negative walks and table refreshes run
    # the masked-psum sharded walk (sampling/sharded_walk.py, bit-identical
    # to the replicated walk) instead of copying the full CSR to every
    # device — the 10M-item regime's ~11 GiB/chip replicated-graph wall
    # (docs/DESIGN.md). The PPR strategy shards too (local edge push +
    # frontier psum; float-tolerance equal to the replicated form).
    shard_graph: bool = True


@dataclass
class PathConfig:
    """Output locations (reference ``config.py:55-61``)."""

    checkpoint_dir: str = "./checkpoints"
    output_dir: str = "./output"


@dataclass
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    graph: GraphConfig = field(default_factory=GraphConfig)
    features: FeatureConfig = field(default_factory=FeatureConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    walk: WalkConfig = field(default_factory=WalkConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    search: SearchConfig = field(default_factory=SearchConfig)
    serve: ServeConfig = field(default_factory=ServeConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    paths: PathConfig = field(default_factory=PathConfig)

    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), indent=2)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        kwargs = {}
        for f in dataclasses.fields(cls):
            sub = d.get(f.name, {})
            sub_cls = f.default_factory  # type: ignore[union-attr]
            if isinstance(sub, dict):
                known = {sf.name for sf in dataclasses.fields(sub_cls)}
                filtered = {k: v for k, v in sub.items() if k in known}
                for sf in dataclasses.fields(sub_cls):
                    v = filtered.get(sf.name)
                    if isinstance(v, list):
                        filtered[sf.name] = tuple(v)
                kwargs[f.name] = sub_cls(**filtered)
        return cls(**kwargs)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        return cls.from_dict(json.loads(s))

    def override(self, dotted: dict[str, Any]) -> "Config":
        """Apply {"train.learning_rate": 3e-4}-style overrides, returning a new
        Config. This replaces the reference's deepcopy-and-mutate-a-module
        pattern (run.py:358-361)."""
        d = self.to_dict()
        for key, value in dotted.items():
            parts = key.split(".")
            node = d
            for p in parts[:-1]:
                if not isinstance(node, dict) or p not in node:
                    raise KeyError(f"unknown config key: {key}")
                node = node[p]
            if not isinstance(node, dict) or parts[-1] not in node:
                raise KeyError(f"unknown config key: {key}")
            node[parts[-1]] = value
        return Config.from_dict(d)


def default_config() -> Config:
    return Config()


def small_test_config() -> Config:
    """A tiny, fast configuration used by unit tests and smoke runs."""
    cfg = Config()
    cfg.data.source = "synthetic"
    cfg.data.synthetic_num_movies = 200
    cfg.data.synthetic_num_users = 400
    cfg.data.synthetic_num_ratings = 8000
    cfg.features.feature_dim = 32
    cfg.model.hidden_dim = 64
    cfg.model.embed_dim = 32
    cfg.walk.num_walks = 20
    cfg.walk.num_neighbors = 8
    cfg.train.batch_size = 64
    cfg.train.epochs = 2
    cfg.train.num_negative_samples = 32
    cfg.train.max_pairs_per_epoch = 256
    cfg.search.lsh_bits = 64
    cfg.search.lsh_tables = 4
    cfg.search.ivf_partitions = 8
    return cfg
