"""Approximate Personalized PageRank neighborhoods (batched power iteration).

Device-native equivalent of the reference's push-style PPR
(``utils/random_walk.py:144-228`` — compute_ppr_matrix +
precompute_top_neighbors; dead code in the reference pipeline, kept for
capability parity, SURVEY.md §2 row 8). The per-source Python push loop
becomes a batched dense-frontier power iteration:

    ppr_{k+1} = ppr_k + alpha * r_k;   r_{k+1} = (1 - alpha) * r_k @ P

with P the row-normalized weighted adjacency applied edge-wise via
``segment_sum`` (no N x N matrix). Memory is O(B * N) for the frontier plus
O(B * E) transient for edge messages — size batches accordingly (this is a
precompute, not a training-step op).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..graph.csr import CSRGraph
from .random_walk import DeviceGraph


def ppr_scores(
    graph,
    sources: jax.Array,      # [B] int32
    num_nodes: int,
    alpha: float = 0.15,
    num_iterations: int = 10,
) -> jax.Array:
    """[B, num_nodes] approximate PPR mass per source.

    ``graph`` may be a replicated ``DeviceGraph`` or a row-sharded
    ``ShardedDeviceGraph`` — the sharded form pushes along local edge slices
    and psums the frontier (float-tolerance equal; see sharded_walk)."""
    if not isinstance(graph, DeviceGraph):
        from .sharded_walk import sharded_ppr_scores

        return sharded_ppr_scores(graph, sources, num_nodes, alpha=alpha,
                                  num_iterations=num_iterations)
    return _ppr_scores_jit(graph, sources, num_nodes, alpha=alpha,
                           num_iterations=num_iterations)


@partial(jax.jit, static_argnames=("num_nodes", "num_iterations", "alpha"))
def _ppr_scores_jit(
    graph: DeviceGraph,
    sources: jax.Array,      # [B] int32
    num_nodes: int,
    alpha: float = 0.15,
    num_iterations: int = 10,
) -> jax.Array:
    b = sources.shape[0]
    # Per-edge row-normalized weights.
    src_of_edge = jnp.repeat(
        jnp.arange(num_nodes, dtype=jnp.int32),
        jnp.diff(graph.indptr),
        total_repeat_length=graph.indices.shape[0],
    )
    row_sum = jax.ops.segment_sum(graph.weights, src_of_edge, num_segments=num_nodes)
    wnorm = graph.weights / jnp.maximum(jnp.take(row_sum, src_of_edge), 1e-12)

    r = jax.nn.one_hot(sources, num_nodes, dtype=jnp.float32)   # residual
    ppr = jnp.zeros_like(r)

    def body(_, state):
        # Every node with residual absorbs the teleport term and then resets;
        # dangling nodes simply drop the rest of their mass — exactly the
        # reference push (random_walk.py:173-189: residual[node] = 0 whether
        # or not the node has neighbors). Total ppr mass stays <= 1; carrying
        # dangling residual undecayed would grow sink scores linearly with
        # num_iterations.
        ppr, r = state
        ppr = ppr + alpha * r
        msg = r[:, src_of_edge] * wnorm[None, :]                 # [B, E]
        pushed = jax.vmap(
            lambda m: jax.ops.segment_sum(m, graph.indices, num_segments=num_nodes)
        )(msg)
        r = (1.0 - alpha) * pushed
        return ppr, r

    ppr, r = jax.lax.fori_loop(0, num_iterations, body, (ppr, r))
    return ppr


def precompute_top_neighbors(
    csr: CSRGraph,
    graph: DeviceGraph,
    nodes: np.ndarray,
    num_neighbors: int = 10,
    alpha: float = 0.15,
    num_iterations: int = 10,
    batch: int = 8,
) -> dict[int, tuple[list[int], list[float]]]:
    """Top-``num_neighbors`` nodes by PPR score with normalized weights,
    mirroring ``precompute_top_neighbors`` (utils/random_walk.py:197-228)."""
    out: dict[int, tuple[list[int], list[float]]] = {}
    nodes = np.asarray(nodes, dtype=np.int32)
    n = csr.num_nodes
    for i in range(0, nodes.shape[0], batch):
        chunk = nodes[i : i + batch]
        # Pad the ragged tail chunk to the full batch size: ppr_scores is
        # shape-specialized under jit, and a second program shape costs a
        # full recompile (minutes over the tunnel backend — CLAUDE.md).
        pad = batch - chunk.shape[0]
        padded = np.pad(chunk, (0, pad), mode="edge") if pad else chunk
        scores = ppr_scores(
            graph, jnp.asarray(padded), n, alpha=alpha,
            num_iterations=num_iterations,
        )
        top_scores, top_idx = jax.lax.top_k(scores, min(num_neighbors, n))
        top_scores = np.asarray(top_scores)[: chunk.shape[0]]
        top_idx = np.asarray(top_idx)[: chunk.shape[0]]
        for row, src in enumerate(chunk):
            s = top_scores[row]
            keep = s > 0
            s, idx = s[keep], top_idx[row][keep]
            tot = s.sum()
            w = (s / tot).tolist() if tot > 0 else []
            out[int(src)] = (idx.tolist(), w)
    return out


@partial(jax.jit, static_argnames=(
    "num_nodes", "num_neighbors", "alpha", "num_iterations", "restrict_below"))
def _ppr_top_neighbors_chunk(
    graph: DeviceGraph,
    sources: jax.Array,
    num_nodes: int,
    num_neighbors: int,
    alpha: float,
    num_iterations: int,
    restrict_below: int | None,
) -> tuple[jax.Array, jax.Array]:
    scores = ppr_scores(graph, sources, num_nodes, alpha=alpha,
                        num_iterations=num_iterations)
    if restrict_below is not None:
        # Rank only movie-node targets (walk.count_nodes="movies" analog).
        mask = jnp.arange(num_nodes) < restrict_below
        scores = jnp.where(mask[None, :], scores, 0.0)
    top, idx = jax.lax.top_k(scores, min(num_neighbors, num_nodes))
    empty = top <= 0.0
    nbrs = jnp.where(empty, num_nodes, idx).astype(jnp.int32)
    w = jnp.where(empty, 0.0, top)
    tot = w.sum(axis=1, keepdims=True)
    w = jnp.where(tot > 0, w / jnp.maximum(tot, 1e-12), 0.0)
    if num_neighbors > num_nodes:
        pad = num_neighbors - num_nodes
        nbrs = jnp.pad(nbrs, ((0, 0), (0, pad)), constant_values=num_nodes)
        w = jnp.pad(w, ((0, 0), (0, pad)))
    return nbrs, w.astype(jnp.float32)


def all_node_neighborhood_tables_ppr(
    graph: DeviceGraph,
    num_layers: int,
    num_neighbors: int,
    num_nodes: int | None = None,
    restrict_below: int | None = None,
    alpha: float = 0.15,
    num_iterations: int = 10,
    batch: int = 512,
) -> list[tuple[jax.Array, jax.Array]]:
    """Per-layer neighborhood tables ranked by PPR mass — drop-in replacement
    for ``random_walk.all_node_neighborhood_tables`` (``walk.strategy="ppr"``).

    PPR is deterministic, so every layer shares ONE table (the random-walk
    strategy resamples per layer). Like the reference's precompute
    (utils/random_walk.py:197-228) the source itself keeps its teleport mass
    and typically ranks first. Cost is O(B·E) transient per chunk (edge-wise
    frontier push) — sized for small/medium corpora; the walk strategy is the
    at-scale default.
    """
    n = num_nodes if num_nodes is not None else graph.num_nodes
    nb_chunks, w_chunks = [], []
    ids = jnp.arange(((n + batch - 1) // batch) * batch, dtype=jnp.int32)
    ids = ids.clip(0, graph.num_nodes - 1)
    for i in range(0, ids.shape[0], batch):
        nb, w = _ppr_top_neighbors_chunk(
            graph, ids[i : i + batch], graph.num_nodes, num_neighbors,
            alpha, num_iterations, restrict_below,
        )
        nb_chunks.append(nb)
        w_chunks.append(w)
    nbrs = jnp.concatenate(nb_chunks, axis=0)[:n]
    weights = jnp.concatenate(w_chunks, axis=0)[:n]
    return [(nbrs, weights) for _ in range(num_layers)]
