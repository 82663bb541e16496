"""Batched on-device random walks + visit-count neighborhoods.

TPU-native replacement for the reference's Python-loop sampler
(``utils/random_walk.py:52-142``) — the #1 hot loop in the reference pipeline
(SURVEY.md §3, "hottest loop"). The reference draws one weighted
``np.random.choice`` per walker per step in the interpreter; here every walker
in a batch advances in lockstep inside one jitted XLA program:

- The graph is CSR in HBM (indptr/indices + per-row cumulative transition
  probabilities, see ``graph/csr.py``).
- A weighted next-hop draw is a binary search of a uniform sample into the
  row's cumprob slice: ``ceil(log2(max_degree))`` rounds of gathers, fully
  vectorized over all walkers (no data-dependent control flow, so XLA can
  pipeline the gathers).
- Visit-count "importance" neighborhoods (``utils/random_walk.py:85-117``)
  become sort + run-length-encode + ``lax.top_k`` over the fixed-size visited
  buffer: ragged Python lists turn into padded ``[B, K]`` tensors with a
  sentinel id (== num_nodes) and zero weight for missing slots.

Semantics preserved from the reference:
- next-hop probability proportional to edge weight (random_walk.py:76-79)
- walks halt at nodes with no neighbors (random_walk.py:68-69)
- visits counted over walk[1:], including returns to the start node
  (random_walk.py:101-104)
- top-``num_neighbors`` by count; weights = counts normalized over the
  selected set only (random_walk.py:107-115)
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import CSRGraph


class DeviceGraph(NamedTuple):
    """CSR adjacency as device arrays. ``sentinel == num_nodes`` marks
    "no node" everywhere downstream."""

    indptr: jax.Array    # [N+1] int32
    indices: jax.Array   # [E] int32
    cumprob: jax.Array   # [E] f32, per-row cumulative probabilities
    weights: jax.Array   # [E] f32 raw edge weights

    @property
    def num_nodes(self) -> int:
        return int(self.indptr.shape[0] - 1)

    @property
    def sentinel(self) -> int:
        return self.num_nodes


def device_graph(csr: CSRGraph) -> DeviceGraph:
    return DeviceGraph(
        indptr=jnp.asarray(csr.indptr, dtype=jnp.int32),
        indices=jnp.asarray(csr.indices, dtype=jnp.int32),
        cumprob=jnp.asarray(csr.cumprob, dtype=jnp.float32),
        weights=jnp.asarray(csr.weights, dtype=jnp.float32),
    )


def search_iters(csr_or_max_degree) -> int:
    """Static binary-search depth: ceil(log2(max_degree + 1))."""
    md = csr_or_max_degree if isinstance(csr_or_max_degree, int) else csr_or_max_degree.max_degree
    return max(1, math.ceil(math.log2(max(md, 1) + 1)))


def _weighted_next_hop(
    graph: DeviceGraph, cur: jax.Array, u: jax.Array, n_iters: int
) -> tuple[jax.Array, jax.Array]:
    """One weighted categorical draw per walker over its CSR row.

    Returns (next_node, has_neighbors). ``cur`` may contain the sentinel;
    such walkers report has_neighbors=False.
    """
    n = graph.num_nodes
    cur_c = jnp.minimum(cur, n - 1)
    start = graph.indptr[cur_c]
    deg = graph.indptr[cur_c + 1] - start
    deg = jnp.where(cur >= n, 0, deg)

    # Lower bound: first j in [0, deg) with cumprob[start + j] >= u.
    lo = jnp.zeros_like(start)
    hi = deg
    for _ in range(n_iters):
        active = lo < hi
        mid = (lo + hi) >> 1
        c = jnp.take(graph.cumprob, start + mid, mode="clip")
        go_right = active & (c < u)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(active & ~go_right, mid, hi)
    nxt = jnp.take(graph.indices, start + jnp.minimum(lo, jnp.maximum(deg - 1, 0)), mode="clip")
    return nxt, deg > 0


def random_walks(
    graph,
    starts: jax.Array,        # [B] int32 start nodes
    key: jax.Array,
    num_walks: int,
    walk_length: int,
    n_iters: int,
) -> jax.Array:
    """All visited nodes of ``num_walks`` weighted walks of ``walk_length``
    steps from each start. Returns [B, num_walks * walk_length] int32 with the
    sentinel at halted positions. Start nodes themselves are not recorded
    (reference counts walk[1:], random_walk.py:103).

    ``graph`` may be a replicated ``DeviceGraph`` or a row-sharded
    ``ShardedDeviceGraph`` (sampling/sharded_walk.py) — the sharded walk is
    bit-identical, so every caller (hard-negative sampling, table refresh)
    transparently supports a sharded CSR."""
    if not isinstance(graph, DeviceGraph):
        from .sharded_walk import sharded_random_walks

        return sharded_random_walks(graph, starts, key, num_walks,
                                    walk_length, n_iters)
    return _random_walks_jit(graph, starts, key, num_walks, walk_length,
                             n_iters)


@partial(jax.jit, static_argnames=("num_walks", "walk_length", "n_iters"))
def _random_walks_jit(
    graph: DeviceGraph,
    starts: jax.Array,
    key: jax.Array,
    num_walks: int,
    walk_length: int,
    n_iters: int,
) -> jax.Array:
    b = starts.shape[0]
    w = num_walks
    sentinel = graph.sentinel
    cur = jnp.repeat(starts.astype(jnp.int32), w)           # [B*W]
    alive = jnp.ones((b * w,), dtype=bool)

    def step(carry, k):
        cur, alive = carry
        u = jax.random.uniform(k, (b * w,))
        nxt, has_nbrs = _weighted_next_hop(graph, cur, u, n_iters)
        record = alive & has_nbrs
        visited_step = jnp.where(record, nxt, sentinel)
        cur = jnp.where(record, nxt, cur)
        return (cur, record), visited_step

    keys = jax.random.split(key, walk_length)
    (_, _), visited = jax.lax.scan(step, (cur, alive), keys)
    # visited: [L, B*W] -> [B, W*L]
    visited = visited.transpose(1, 0).reshape(b, w * walk_length)
    return visited


def _run_length_counts(visited_sorted: jax.Array, sentinel: int) -> jax.Array:
    """Per-row counts at run starts of an ascending-sorted id buffer; zero
    elsewhere and at sentinel entries. [B, M] -> [B, M] int32."""
    b, m = visited_sorted.shape
    idx = jax.lax.broadcasted_iota(jnp.int32, (b, m), 1)
    is_start = jnp.concatenate(
        [jnp.ones((b, 1), dtype=bool),
         visited_sorted[:, 1:] != visited_sorted[:, :-1]],
        axis=1,
    )
    r = jnp.where(is_start, idx, m)
    # Exclusive suffix-min of r -> index of the next run start after i.
    suffix_min = jax.lax.associative_scan(
        jnp.minimum, r[:, ::-1], axis=1
    )[:, ::-1]
    next_start = jnp.concatenate(
        [suffix_min[:, 1:], jnp.full((b, 1), m, dtype=jnp.int32)], axis=1
    )
    counts = jnp.where(
        is_start & (visited_sorted < sentinel), next_start - idx, 0
    )
    return counts


@partial(jax.jit, static_argnames=("num_neighbors", "sentinel", "restrict_below"))
def importance_neighborhoods(
    visited: jax.Array,       # [B, M] from random_walks
    num_neighbors: int,
    sentinel: int,
    restrict_below: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Top-``num_neighbors`` visited nodes by visit count, with weights
    normalized over the selected set. Missing slots get the sentinel id and
    weight 0. Returns (neighbors [B, K] int32, weights [B, K] f32).

    ``restrict_below`` counts only nodes with id < restrict_below (e.g. movie
    nodes of a bipartite graph) — the PinSage-paper semantics where the
    neighborhood of an item is other *items*. The reference counts every
    visited node and silently drops non-item ids at pooling time
    (model/pinsage.py:124), wasting top-K slots; restrict_below=None
    reproduces that."""
    if restrict_below is not None:
        visited = jnp.where(visited < restrict_below, visited, sentinel)
    v = jnp.sort(visited, axis=1)
    counts = _run_length_counts(v, sentinel)
    k = min(num_neighbors, v.shape[1])
    top_counts, pos = jax.lax.top_k(counts, k)
    nbrs = jnp.take_along_axis(v, pos, axis=1)
    nbrs = jnp.where(top_counts > 0, nbrs, sentinel)
    total = jnp.sum(top_counts, axis=1, keepdims=True)
    weights = jnp.where(
        total > 0, top_counts.astype(jnp.float32) / total.astype(jnp.float32), 0.0
    )
    if k < num_neighbors:
        pad = num_neighbors - k
        nbrs = jnp.pad(nbrs, ((0, 0), (0, pad)), constant_values=sentinel)
        weights = jnp.pad(weights, ((0, 0), (0, pad)))
    return nbrs.astype(jnp.int32), weights


def sample_neighborhoods(
    graph: DeviceGraph,
    nodes: jax.Array,
    key: jax.Array,
    num_walks: int,
    walk_length: int,
    num_neighbors: int,
    n_iters: int,
    restrict_below: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Walks + importance top-K in one call — the batched equivalent of
    ``RandomWalkSampler.batch_sample_neighbors`` (utils/random_walk.py:119-142)."""
    visited = random_walks(graph, nodes, key, num_walks, walk_length, n_iters)
    return importance_neighborhoods(visited, num_neighbors, graph.sentinel,
                                    restrict_below)


@partial(jax.jit, static_argnames=(
    "num_layers", "num_walks", "walk_length", "num_neighbors", "n_iters",
    "restrict_below"))
def _multilayer_neighborhoods(
    graph: DeviceGraph,
    nodes: jax.Array,
    key: jax.Array,
    num_layers: int,
    num_walks: int,
    walk_length: int,
    num_neighbors: int,
    n_iters: int,
    restrict_below: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """``num_layers`` independent neighborhood tables for one node chunk in
    ONE jitted program ([L, B, K] ids / weights). The per-layer walk+top-k
    pair used to be 2 dispatches x layers x chunks; over the remote-PJRT
    tunnel each dispatch costs a round-trip, so fusing them cuts refresh
    latency at ML-25M scale."""
    outs_n, outs_w = [], []
    for k in jax.random.split(key, num_layers):
        visited = random_walks(graph, nodes, k, num_walks, walk_length, n_iters)
        nb, w = importance_neighborhoods(visited, num_neighbors, graph.sentinel,
                                         restrict_below)
        outs_n.append(nb)
        outs_w.append(w)
    return jnp.stack(outs_n), jnp.stack(outs_w)


def all_node_neighborhood_tables(
    graph: DeviceGraph,
    key: jax.Array,
    num_layers: int,
    num_walks: int,
    walk_length: int,
    num_neighbors: int,
    n_iters: int,
    batch: int = 16384,
    num_nodes: int | None = None,
    restrict_below: int | None = None,
) -> list[tuple[jax.Array, jax.Array]]:
    """Per-layer neighborhood tables for every node — the fused, chunked
    equivalent of calling ``all_node_neighborhoods`` once per layer
    (model/pinsage.py:271-275 semantics: one independent table per layer)."""
    n = num_nodes if num_nodes is not None else graph.num_nodes
    padded = ((n + batch - 1) // batch) * batch
    ids = jnp.arange(padded, dtype=jnp.int32).clip(0, graph.num_nodes - 1)
    keys = jax.random.split(key, padded // batch)
    nb_chunks, w_chunks = [], []
    for i, k in enumerate(keys):
        nb, w = _multilayer_neighborhoods(
            graph, ids[i * batch : (i + 1) * batch], k, num_layers,
            num_walks, walk_length, num_neighbors, n_iters, restrict_below,
        )
        nb_chunks.append(nb)
        w_chunks.append(w)
    nbrs = jnp.concatenate(nb_chunks, axis=1)[:, :n]   # [L, N, K]
    weights = jnp.concatenate(w_chunks, axis=1)[:, :n]
    return [(nbrs[l], weights[l]) for l in range(num_layers)]


def all_node_neighborhoods(
    graph: DeviceGraph,
    key: jax.Array,
    num_walks: int,
    walk_length: int,
    num_neighbors: int,
    n_iters: int,
    batch: int = 8192,
    num_nodes: int | None = None,
    restrict_below: int | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Neighborhood tables for every node: ([N, K] ids, [N, K] weights).

    Chunked over node batches to bound the [B, W*L] walk buffer. The tables
    are what the training step and full-graph inference gather from
    (epoch-cached; see train/trainer.py).
    """
    n = num_nodes if num_nodes is not None else graph.num_nodes
    nbrs_out = []
    w_out = []
    padded = ((n + batch - 1) // batch) * batch
    ids = jnp.arange(padded, dtype=jnp.int32).clip(0, graph.num_nodes - 1)
    keys = jax.random.split(key, padded // batch)
    for i, k in enumerate(keys):
        chunk = ids[i * batch : (i + 1) * batch]
        nb, w = sample_neighborhoods(
            graph, chunk, k, num_walks, walk_length, num_neighbors, n_iters,
            restrict_below,
        )
        nbrs_out.append(nb)
        w_out.append(w)
    nbrs = jnp.concatenate(nbrs_out, axis=0)[:n]
    weights = jnp.concatenate(w_out, axis=0)[:n]
    return nbrs, weights


# ---------------------------------------------------------------------------
# Reference-parity helpers (host-side, for tests)
# ---------------------------------------------------------------------------

def numpy_reference_sample(
    csr: CSRGraph, node: int, num_walks: int, walk_length: int,
    num_neighbors: int, rng: np.random.Generator,
) -> tuple[list[int], list[float]]:
    """Direct transcription of the reference algorithm semantics
    (utils/random_walk.py:52-117) used as the tests' golden model."""
    from collections import Counter

    visit_counts: Counter = Counter()
    for _ in range(num_walks):
        cur = node
        for _ in range(walk_length):
            nbrs, w = csr.neighbors(cur)
            if nbrs.shape[0] == 0:
                break
            p = w / w.sum()
            cur = int(rng.choice(nbrs, p=p))
            visit_counts[cur] += 1
    top = sorted(visit_counts.items(), key=lambda x: x[1], reverse=True)[:num_neighbors]
    if not top:
        return [], []
    ns, cs = zip(*top)
    tot = sum(cs)
    return list(ns), [c / tot for c in cs]
