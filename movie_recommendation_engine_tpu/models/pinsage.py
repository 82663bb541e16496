"""PinSage as pure JAX functions.

Functional re-design of the reference model (``model/pinsage.py:151-279``).
Parameters are a pytree; every forward path is jittable and differentiable.
The reference's three forward paths are preserved:

(a) **MLP path** (no graph info): relu(input_proj) -> per-layer
    relu(lin_self) -> output_proj -> L2-norm (model/pinsage.py:205-214).
(b) **Importance-pooling path** (per-layer [B, K] neighborhoods + weights):
    pool -> concat with lin_self(h) -> lin_update -> ReLU -> L2-norm
    (model/pinsage.py:217-240). The reference's per-node Python pooling loop
    (model/pinsage.py:101-150, hot loop #3 in SURVEY.md §3) becomes a masked
    gather + einsum that XLA fuses onto the MXU.
(c) **edge_index path**: full-graph message passing, sum-aggregated with
    optional edge/importance weights (model/pinsage.py:8-92 GraphConv) via
    ``jax.ops.segment_sum``.

Fixed-shape conventions replacing the reference's ragged lists:
neighbor id == ``sentinel`` (>= table size) marks an empty slot; pooling masks
it and renormalizes over the valid set (matching the reference's
filter-then-renormalize, model/pinsage.py:119-143). A row with no valid
neighbors pools to the zero vector (model/pinsage.py:116,133).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..ops.block_sparse import BlockPool, block_pool_matmul
from ..ops.hub_pool import HubPool, hub_pool_matmul, hub_pool_matmul_batch
from . import aggregators

Params = dict[str, Any]


def _pool_apply(pm, h: jax.Array, dtype, gather_impl: str | None = None) -> jax.Array:
    """Full-graph pooling through either dense-matrix or block-sparse form.

    ``pm`` is a per-layer pooling operator: a dense [N, N] array (MXU matmul
    — corpora whose A fits HBM), an ops.hub_pool.HubPool (dense hub head +
    sparse residual — the >64k-row regime where [N, N] doesn't fit), or an
    ops.block_sparse.BlockPool (clustered [bs, cs] tiles)."""
    if isinstance(pm, HubPool):
        return hub_pool_matmul(pm, h, dtype=dtype,
                               gather_impl=gather_impl or _GATHER_IMPL)
    if isinstance(pm, BlockPool):
        return block_pool_matmul(pm, h, dtype=dtype)
    return jnp.dot(pm.astype(dtype), h.astype(dtype),
                   preferred_element_type=jnp.float32).astype(dtype)

_EPS = 1e-12  # torch F.normalize eps (model/pinsage.py:66)


def _linear_init(key: jax.Array, fan_in: int, fan_out: int,
                 style: str = "he_zero_bias") -> dict[str, jax.Array]:
    """Linear-layer init.

    - "he_zero_bias" (default): He-normal weights, zero biases. The torch
      default draws biases U(-1/sqrt(fan_in), ..) — at init those random
      biases dominate the (repeatedly L2-normalized) signal path, collapsing
      all embeddings onto the bias direction (measured: mean pairwise cosine
      0.96 at init, hinge loss pinned at exactly `margin`, zero learning).
    - "torch_default": U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both weight and
      bias — bit-parity with the reference's nn.Linear init.
    """
    kw, kb = jax.random.split(key)
    if style == "torch_default":
        bound = 1.0 / jnp.sqrt(fan_in)
        return {
            "w": jax.random.uniform(kw, (fan_in, fan_out), minval=-bound, maxval=bound),
            "b": jax.random.uniform(kb, (fan_out,), minval=-bound, maxval=bound),
        }
    std = jnp.sqrt(2.0 / fan_in)
    return {
        "w": std * jax.random.normal(kw, (fan_in, fan_out)),
        "b": jnp.zeros((fan_out,)),
    }


def linear(p: dict[str, jax.Array], x: jax.Array, dtype=None) -> jax.Array:
    """Affine layer. With ``dtype`` given, inputs/weights are cast to it and
    the OUTPUT STAYS in that dtype — the whole hidden pipeline (including the
    bandwidth-dominating [B, K, D] neighbor gathers) then runs in bf16;
    upcasting to f32 after every layer forced XLA to keep f32 activation
    tables and gather 2x the bytes. Params remain f32; reductions that need
    precision (L2 norms, loss) compute in f32 explicitly."""
    w, b = p["w"], p["b"]
    if dtype is not None:
        x, w = x.astype(dtype), w.astype(dtype)
    return x @ w + b.astype(x.dtype)


def l2_normalize(x: jax.Array, axis: int = -1) -> jax.Array:
    xf = x.astype(jnp.float32)
    n = jnp.linalg.norm(xf, axis=axis, keepdims=True)
    return (xf / jnp.maximum(n, _EPS)).astype(x.dtype)


def init_params(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    embed_dim: int,
    num_layers: int = 2,
    aggregator: str = "importance",
    use_batch_norm: bool = False,
    init_style: str = "he_zero_bias",
) -> Params:
    """Mirrors PinSage.__init__ (model/pinsage.py:155-184): input_proj,
    ``num_layers`` GraphConv blocks (lin_self / lin_neigh / lin_update), and
    output_proj. Aggregators that carry parameters (attention / max /
    importance-transform, model/aggregators.py:93-287) get their extra
    leaves under conv["agg"]."""
    keys = jax.random.split(key, num_layers + 2)
    params: Params = {
        "input_proj": _linear_init(keys[0], in_dim, hidden_dim, init_style),
        "convs": [],
        "output_proj": _linear_init(keys[1], hidden_dim, embed_dim, init_style),
    }
    for i in range(num_layers):
        ck = jax.random.split(keys[2 + i], 4)
        conv = {
            "self": _linear_init(ck[0], hidden_dim, hidden_dim, init_style),
            "neigh": _linear_init(ck[1], hidden_dim, hidden_dim, init_style),
            "update": _linear_init(ck[2], 2 * hidden_dim, hidden_dim, init_style),
        }
        agg_p = aggregators.init_aggregator_params(ck[3], aggregator, hidden_dim, hidden_dim)
        if agg_p is not None:
            conv["agg"] = agg_p
        if use_batch_norm:
            # Honors the USE_BATCH_NORM knob (reference config.py:25, applied
            # in the alternate GraphConvLayer, model/layers.py:29,67-69).
            conv["bn"] = {
                "scale": jnp.ones((hidden_dim,)),
                "bias": jnp.zeros((hidden_dim,)),
            }
        params["convs"].append(conv)
    return params


def num_params(params: Params) -> int:
    return sum(p.size for p in jax.tree_util.tree_leaves(params))


# ---------------------------------------------------------------------------
# (a) MLP path
# ---------------------------------------------------------------------------

def mlp_forward(params: Params, x: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """model/pinsage.py:205-214 — used by the reference's shipped train loop
    (train.py:72) and run.py's all-movie embedding (run.py:157-165)."""
    h = jax.nn.relu(linear(params["input_proj"], x, dtype))
    for conv in params["convs"]:
        h = jax.nn.relu(linear(conv["self"], h, dtype))
    return l2_normalize(linear(params["output_proj"], h, dtype).astype(jnp.float32))


# ---------------------------------------------------------------------------
# (b) importance-pooling path
# ---------------------------------------------------------------------------

# Gather-form pooling implementation: "xla" (gather + einsum) or "pallas"
# (fused DMA-gather kernel, ops/pallas/pool.py — gathered rows live only in
# VMEM instead of a round-tripped [B, K, D] HBM tensor). The Trainer resolves
# config.model.gather_impl (with backend gating — the axon tunnel cannot
# remote-compile Mosaic kernels, CLAUDE.md) and THREADS it through the
# forward functions as the ``gather_impl`` argument; this module-level
# default only backs callers that don't pass one (it is process-global, so
# two Trainers with different configs must not share it — hence threading).
_GATHER_IMPL = "xla"


def set_gather_impl(impl: str) -> None:
    global _GATHER_IMPL
    if impl not in ("xla", "pallas"):
        raise ValueError(f"gather impl must be 'xla' or 'pallas', got {impl!r}")
    _GATHER_IMPL = impl


def importance_pool(
    h_table: jax.Array,   # [N, D]
    nbrs: jax.Array,      # [B, K] int32, sentinel for empty slots
    weights: jax.Array,   # [B, K] f32
    valid_limit: int | None = None,
    dtype=jnp.bfloat16,
    impl: str | None = None,
) -> jax.Array:
    """Masked weighted-sum pooling (model/pinsage.py:101-150).

    ``valid_limit`` masks neighbors with id >= limit — reproducing the
    reference's silent drop of out-of-range (user-node) indices when pooling
    over a movies-only table (model/pinsage.py:124).

    ``impl`` overrides the module-level gather implementation ("xla" or
    "pallas"); both compute identical math (tests/test_pallas_ops.py)."""
    n = h_table.shape[0]
    limit = n if valid_limit is None else min(valid_limit, n)
    valid = nbrs < limit
    w = jnp.where(valid, weights, 0.0)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(wsum > 0, w / jnp.maximum(wsum, _EPS), 0.0)
    if (impl or _GATHER_IMPL) == "pallas":
        from ..core.backend import pallas_allowed

        if not pallas_allowed():
            # Tunnel without the MRE_TUNNEL_PALLAS=1 opt-in: remote Mosaic
            # compiles work since round 3 but are erratically slow, so a
            # pallas request silently takes the XLA formulation below (same
            # math — core/backend.py).
            pass
        else:
            from ..ops.pallas.pool import gather_pool_ad

            # Interpret mode off-TPU (Mosaic kernels only compile for TPU);
            # the table is cast to ``dtype`` first so the per-row DMAs move
            # half the bytes, matching the XLA path's cast-before-gather.
            interpret = jax.default_backend() != "tpu"
            out = gather_pool_ad(h_table.astype(dtype), nbrs,
                                 w.astype(jnp.float32), limit, 8, interpret)
            return out.astype(dtype)
    # Cast the table BEFORE the gather: the [B, K, D] gather (and its
    # backward scatter) dominates step bandwidth; moving bf16 instead of f32
    # halves the bytes (step is HBM-bound — 3.5 GB/step at bench shapes).
    feats = jnp.take(
        h_table.astype(dtype), jnp.minimum(nbrs, n - 1), axis=0, mode="clip"
    )
    out = jnp.einsum(
        "bk,bkd->bd", w.astype(dtype), feats,
        preferred_element_type=jnp.float32,
    )
    return out.astype(dtype)


def dense_pool_matrix(
    nbrs: jax.Array,      # [N, K] int32
    weights: jax.Array,   # [N, K] f32
    num_cols: int,
    valid_limit: int | None = None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """[N, num_cols] row-stochastic pooling matrix A with
    A[i, nbrs[i, k]] += w_norm[i, k] (masked + renormalized like
    ``importance_pool``).

    Pooling then becomes ``A @ h`` — a dense bf16 matmul on the MXU. On TPU
    the irregular [B, K, D] row gather runs at a fraction of HBM bandwidth
    (measured ~5 ms for an [8192, 50, 256] gather vs ~0.2 ms of MXU matmul
    FLOPs for the dense form), so for corpora where A fits comfortably in
    HBM (N^2 * 2 bytes) the matmul wins by an order of magnitude. Built once
    per neighborhood refresh.
    """
    n, k = nbrs.shape
    limit = num_cols if valid_limit is None else min(valid_limit, num_cols)
    valid = nbrs < limit
    w = jnp.where(valid, weights, 0.0)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(wsum > 0, w / jnp.maximum(wsum, _EPS), 0.0)
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32)[:, None], k, axis=1)
    a = jnp.zeros((n, num_cols), dtype=jnp.float32)
    a = a.at[rows.reshape(-1), jnp.minimum(nbrs, num_cols - 1).reshape(-1)].add(
        w.reshape(-1)
    )
    return a.astype(dtype)


def dense_pool_matrix_direct(
    nbrs: jax.Array,
    weights: jax.Array,
    num_cols: int,
    valid_limit: int | None = None,
    dtype=jnp.bfloat16,
    out_sharding=None,     # NamedSharding: keep the [N, C] scatter output
                           # row-sharded under a mesh (GSPMD otherwise
                           # replicates it on every device — the same wall
                           # fixed for the hub slab, ops/hub_pool.py)
) -> jax.Array:
    """``dense_pool_matrix`` scattering straight into a ``dtype`` buffer —
    ONE resident [N, num_cols] allocation (7 GB bf16 at ML-25M scale) with no
    f32 intermediate and no cross-call donation (buffer aliasing is not
    honored over the remote-PJRT tunnel, which double-buffers a chunked
    build into OOM). Exact when each row's neighbor ids are unique — true
    for tables from ``importance_neighborhoods`` (RLE'd top-k); duplicate
    ids would accumulate in ``dtype`` instead of f32."""
    n, k = nbrs.shape
    limit = num_cols if valid_limit is None else min(valid_limit, num_cols)
    valid = nbrs < limit
    w = jnp.where(valid, weights, 0.0)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    w = jnp.where(wsum > 0, w / jnp.maximum(wsum, _EPS), 0.0)
    rows = jnp.repeat(jnp.arange(n, dtype=jnp.int32)[:, None], k, axis=1)
    a = jnp.zeros((n, num_cols), dtype=dtype)
    a = a.at[rows.reshape(-1), jnp.minimum(nbrs, num_cols - 1).reshape(-1)].add(
        w.reshape(-1).astype(dtype)
    )
    if out_sharding is not None:
        a = jax.lax.with_sharding_constraint(a, out_sharding)
    return a


def build_pool_matrix(
    nbrs: jax.Array,      # [N, K] int32
    weights: jax.Array,   # [N, K] f32
    num_cols: int,
    valid_limit: int | None = None,
    dtype=jnp.bfloat16,
    direct_above_rows: int = 8192,
    out_sharding=None,
) -> jax.Array:
    """Memory-aware ``dense_pool_matrix``: tables up to ``direct_above_rows``
    keep the f32-accumulate build; larger ones scatter straight into the
    ``dtype`` buffer (``dense_pool_matrix_direct``) so peak memory is the one
    [N, num_cols] output (7 GB bf16 at ML-25M scale) instead of the 13.9 GB
    f32 intermediate. (A chunked build relying on cross-call buffer donation
    was abandoned — donation is not honored over the remote-PJRT tunnel and
    it double-buffered into OOM.) This threshold switch is what makes the
    dense MXU pooling path viable at 59k rows (hybrid mode)."""
    n = int(nbrs.shape[0])
    if n <= direct_above_rows and out_sharding is None:
        return dense_pool_matrix(nbrs, weights, num_cols, valid_limit, dtype)
    build = jax.jit(dense_pool_matrix_direct,
                    static_argnames=("num_cols", "valid_limit", "dtype",
                                     "out_sharding"))
    return build(nbrs, weights, num_cols=num_cols, valid_limit=valid_limit,
                 dtype=dtype, out_sharding=out_sharding)


# Former name (the chunked-donation design it described is gone).
build_pool_matrix_chunked = build_pool_matrix


def pooled_forward_dense(
    params: Params,
    x_table: jax.Array,
    pool_mats: list[jax.Array],   # per layer [N, N] from dense_pool_matrix
    dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Full-graph pooled forward with matmul pooling (importance aggregator
    only — the dense form of ``pooled_forward``)."""
    convs = params["convs"]
    assert len(pool_mats) == len(convs), (
        "pooled_forward_dense needs one pool matrix per layer; for a dense "
        "prefix + gather tail use pooled_forward(pool_mats=...) (hybrid)")
    h = jax.nn.relu(linear(params["input_proj"], x_table, dtype))
    for i, conv in enumerate(convs):
        h_neigh = jnp.dot(pool_mats[i].astype(dtype), h.astype(dtype),
                          preferred_element_type=jnp.float32).astype(dtype)
        h = _conv_block(conv, h, h_neigh, dtype)
        if i < len(convs) - 1:
            h, dropout_rng = _dropout(h, dropout_rate, dropout_rng)
    return l2_normalize(linear(params["output_proj"], h, dtype).astype(jnp.float32))


def pooled_forward_batch_dense(
    params: Params,
    x_table: jax.Array,
    pool_mats: list[jax.Array],
    batch_nodes: jax.Array,
    dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
) -> jax.Array:
    """Dense-matmul variant of ``pooled_forward_batch``: full-graph convs for
    layers 0..L-2, final conv restricted to ``batch_nodes`` via a row-gather
    of A (a [B, N] slab — contiguous wide rows, which TPUs gather well,
    unlike [B, K, D] scattered rows)."""
    convs = params["convs"]
    assert len(pool_mats) == len(convs), (
        "pooled_forward_batch_dense needs one pool matrix per layer; for a "
        "dense prefix + gather tail use pooled_forward_batch(pool_mats=...)")
    h = jax.nn.relu(linear(params["input_proj"], x_table, dtype))
    for i, conv in enumerate(convs[:-1]):
        h_neigh = jnp.dot(pool_mats[i].astype(dtype), h.astype(dtype),
                          preferred_element_type=jnp.float32).astype(dtype)
        h = _conv_block(conv, h, h_neigh, dtype)
        h, dropout_rng = _dropout(h, dropout_rate, dropout_rng)
    last = convs[-1]
    li = len(convs) - 1
    a_batch = jnp.take(pool_mats[li], batch_nodes, axis=0, mode="clip")
    h_batch = jnp.take(h, batch_nodes, axis=0, mode="clip")
    h_neigh = jnp.dot(a_batch.astype(dtype), h.astype(dtype),
                      preferred_element_type=jnp.float32).astype(dtype)
    h_out = _conv_block(last, h_batch, h_neigh, dtype)
    return l2_normalize(linear(params["output_proj"], h_out, dtype).astype(jnp.float32))


def _dropout(h: jax.Array, rate: float, rng: jax.Array | None):
    """Inverted dropout; returns (h, advanced rng). No-op when rate/rng unset.
    Applied after hidden convs only (never after the final conv), identically
    in the full-graph and batch forwards — they must define the same
    stochastic network for a given params+rng."""
    if rate <= 0.0 or rng is None:
        return h, rng
    rng, sub = jax.random.split(rng)
    keep = jax.random.bernoulli(sub, 1.0 - rate, h.shape)
    return jnp.where(keep, h / (1.0 - rate), 0.0), rng


def _conv_block(
    conv: Params,
    h_self_in: jax.Array,
    h_neigh: jax.Array,
    dtype,
) -> jax.Array:
    """concat(lin_self(h), pooled) -> lin_update [-> BN] -> ReLU -> L2-norm
    (model/pinsage.py:234-240; BN order per model/layers.py:65-72 when the
    USE_BATCH_NORM knob added a "bn" leaf at init)."""
    h_self = linear(conv["self"], h_self_in, dtype)
    h_cat = jnp.concatenate([h_self, h_neigh], axis=-1)
    h = linear(conv["update"], h_cat, dtype)
    if "bn" in conv and h.shape[0] > 1:
        mean = h.mean(axis=0, keepdims=True)
        var = h.var(axis=0, keepdims=True)
        h = (h - mean) * jax.lax.rsqrt(var + 1e-5)
        h = h * conv["bn"]["scale"] + conv["bn"]["bias"]
    h = jax.nn.relu(h)
    return l2_normalize(h)


def pooled_forward(
    params: Params,
    x_table: jax.Array,                 # [N, F] node features
    layer_neighbors: list[jax.Array],   # per layer [N, K] int32
    layer_weights: list[jax.Array],     # per layer [N, K] f32
    valid_limit: int | None = None,
    dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    aggregator: str = "importance",
    pool_mats: tuple | list = (),
    gather_impl: str | None = None,
) -> jax.Array:
    """Full-graph forward: embeddings for every row of ``x_table``.

    Equivalent of PinSage.get_embeddings (model/pinsage.py:253-279) with
    per-layer neighborhood tables. ``dropout_rate`` honors the reference's
    declared-but-unused DROPOUT knob (config.py:24) when an rng is supplied.

    ``pool_mats`` may supply dense pooling matrices for a PREFIX of the
    layers (hybrid mode): layer i < len(pool_mats) pools via the MXU matmul
    A_i @ h, the remaining layers via the gather aggregator. Used when the
    full set of [N, N] matrices doesn't fit HBM but one does (the ML-25M
    regime — the layer-0 full-graph gather dominates step time there).
    """
    convs = params["convs"]
    h = jax.nn.relu(linear(params["input_proj"], x_table, dtype))
    for i, conv in enumerate(convs):
        if i < len(pool_mats):
            h_neigh = _pool_apply(pool_mats[i], h, dtype, gather_impl)
        else:
            nbrs = layer_neighbors[min(i, len(layer_neighbors) - 1)]
            w = layer_weights[min(i, len(layer_weights) - 1)]
            h_neigh = aggregators.aggregate(
                aggregator, conv.get("agg"), h, nbrs, w,
                self_feats=h, valid_limit=valid_limit, dtype=dtype,
                gather_impl=gather_impl,
            ).astype(dtype)
        h = _conv_block(conv, h, h_neigh, dtype)
        if i < len(convs) - 1:
            h, dropout_rng = _dropout(h, dropout_rate, dropout_rng)
    return l2_normalize(linear(params["output_proj"], h, dtype).astype(jnp.float32))


def pooled_forward_batch(
    params: Params,
    x_table: jax.Array,
    layer_neighbors: list[jax.Array],
    layer_weights: list[jax.Array],
    batch_nodes: jax.Array,             # [B] int32 rows to embed
    valid_limit: int | None = None,
    dtype=jnp.bfloat16,
    dropout_rate: float = 0.0,
    dropout_rng: jax.Array | None = None,
    aggregator: str = "importance",
    pool_mats: tuple | list = (),
    gather_impl: str | None = None,
) -> jax.Array:
    """Training-step forward: layers 0..L-2 run full-graph (their outputs are
    the gather table for the next layer); only the final conv + output proj
    are restricted to ``batch_nodes``. For the default L=2 this is one
    full-graph conv + one batch-sized conv — all MXU-shaped matmuls, no
    host work.

    ``pool_mats`` (hybrid mode, see ``pooled_forward``): dense MXU pooling
    for a prefix of the layers. With L=2 and one matrix this removes the
    dominant [N, K, D] full-graph gather; the final layer's batch-restricted
    [B, K, D] gather is cheap."""
    convs = params["convs"]
    h = jax.nn.relu(linear(params["input_proj"], x_table, dtype))
    for i, conv in enumerate(convs[:-1]):
        if i < len(pool_mats):
            h_neigh = _pool_apply(pool_mats[i], h, dtype, gather_impl)
        else:
            nbrs = layer_neighbors[min(i, len(layer_neighbors) - 1)]
            w = layer_weights[min(i, len(layer_weights) - 1)]
            h_neigh = aggregators.aggregate(
                aggregator, conv.get("agg"), h, nbrs, w,
                self_feats=h, valid_limit=valid_limit, dtype=dtype,
                gather_impl=gather_impl,
            ).astype(dtype)
        h = _conv_block(conv, h, h_neigh, dtype)
        h, dropout_rng = _dropout(h, dropout_rate, dropout_rng)
    last = convs[-1]
    li = len(convs) - 1
    h_batch = jnp.take(h, batch_nodes, axis=0, mode="clip")
    if li < len(pool_mats) and isinstance(pool_mats[li], HubPool):
        # Batch-restricted hub apply: bitwise-equal rows of the full hub
        # pool (rows of A are independent) at a [B, H] slab row-gather
        # instead of the full [N, H] matmul (ops/hub_pool.py).
        h_neigh = hub_pool_matmul_batch(
            pool_mats[li], h, batch_nodes, dtype=dtype,
            gather_impl=gather_impl or _GATHER_IMPL,
        )
    elif li < len(pool_mats) and isinstance(pool_mats[li], BlockPool):
        # No cheap batch-row slab of a block pool; pool the full graph
        # and take the batch rows (block pools are normally prefix-only).
        h_neigh = jnp.take(_pool_apply(pool_mats[li], h, dtype, gather_impl),
                           batch_nodes, axis=0, mode="clip")
    elif li < len(pool_mats):
        a_batch = jnp.take(pool_mats[li], batch_nodes, axis=0, mode="clip")
        h_neigh = jnp.dot(a_batch.astype(dtype), h.astype(dtype),
                          preferred_element_type=jnp.float32).astype(dtype)
    else:
        nbrs = layer_neighbors[min(li, len(layer_neighbors) - 1)]
        w = layer_weights[min(li, len(layer_weights) - 1)]
        bn = jnp.take(nbrs, batch_nodes, axis=0, mode="clip")
        bw = jnp.take(w, batch_nodes, axis=0, mode="clip")
        h_neigh = aggregators.aggregate(
            aggregator, last.get("agg"), h, bn, bw,
            self_feats=h_batch, valid_limit=valid_limit, dtype=dtype,
            gather_impl=gather_impl,
        ).astype(dtype)
    h_out = _conv_block(last, h_batch, h_neigh, dtype)
    return l2_normalize(linear(params["output_proj"], h_out, dtype).astype(jnp.float32))


# ---------------------------------------------------------------------------
# (c) edge_index path (full message passing)
# ---------------------------------------------------------------------------

def edge_forward(
    params: Params,
    x: jax.Array,             # [N, F]
    edge_src: jax.Array,      # [E] int32
    edge_dst: jax.Array,      # [E] int32
    edge_weight: jax.Array | None = None,
    dtype=jnp.bfloat16,
) -> jax.Array:
    """GraphConv message passing (model/pinsage.py:8-92): per conv,
    msg = lin_neigh(h)[src] * edge_weight, sum-scattered to dst
    (aggr='add', :20), then concat/update/relu/L2-norm — via segment_sum."""
    n = x.shape[0]
    h = jax.nn.relu(linear(params["input_proj"], x, dtype))
    for conv in params["convs"]:
        transformed = linear(conv["neigh"], h, dtype)
        msg = jnp.take(transformed, edge_src, axis=0)
        if edge_weight is not None:
            msg = msg * edge_weight[:, None]
        # Accumulate in f32: this is an UNNORMALIZED sum (aggr='add'), so a
        # high-degree node scatter-adds thousands of terms — bf16's 8
        # mantissa bits lose percent-level precision there (the pooling
        # paths' einsums already use preferred_element_type=f32).
        h_neigh = jax.ops.segment_sum(
            msg.astype(jnp.float32), edge_dst, num_segments=n
        ).astype(dtype)
        h = _conv_block(conv, h, h_neigh, dtype)
    return l2_normalize(linear(params["output_proj"], h, dtype).astype(jnp.float32))


def forward(
    params: Params,
    x: jax.Array,
    edge_index: tuple[jax.Array, jax.Array] | None = None,
    sampled_neighbors: list[jax.Array] | None = None,
    importance_weights: list[jax.Array] | None = None,
    **kw,
) -> jax.Array:
    """Dispatching wrapper mirroring PinSage.forward's path selection
    (model/pinsage.py:186-251)."""
    if edge_index is None and (sampled_neighbors is None or importance_weights is None):
        return mlp_forward(params, x, kw.get("dtype", jnp.bfloat16))
    if edge_index is None:
        kw.pop("edge_weight", None)  # pooled path has no edge weights
        return pooled_forward(params, x, sampled_neighbors, importance_weights, **kw)
    return edge_forward(params, x, edge_index[0], edge_index[1],
                        kw.get("edge_weight"),
                        dtype=kw.get("dtype", jnp.bfloat16))
