"""Distributed retrieval over row-sharded embedding tables.

BASELINE.json config 5 capability: candidate generation over a corpus that
lives sharded across a pod slice. Each shard scores its local rows and
produces a local top-k; a single all-gather of the [S, k] partial results
(tiny) plus a final merge yields the exact global top-k — the classic
distributed-MIPS reduction. Communication: O(S * k) scores, never the corpus.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def sharded_similarity_topk(
    mesh: Mesh,
    embeddings: jax.Array,   # [N, D] row-sharded over `axis` (N % size == 0)
    queries: jax.Array,      # [Q, D] replicated
    k: int,
    axis: str = "model",
    valid_rows: int | None = None,
):
    """Exact inner-product top-k over a row-sharded corpus.

    Rows >= ``valid_rows`` (shard padding) are masked to -inf — similarities
    are signed, so a zero-vector padding row (score 0) would otherwise win
    whenever every real score is negative.
    Returns (scores [Q, k], global indices [Q, k]), replicated.
    """
    n = embeddings.shape[0]
    size = mesh.shape[axis]
    chunk = n // size
    kk = min(k, chunk)
    limit = n if valid_rows is None else valid_rows

    def local(emb_local, q):
        s = jax.lax.axis_index(axis)
        gidx_rows = s * chunk + jnp.arange(chunk)
        sims = jnp.dot(q, emb_local.T, preferred_element_type=jnp.float32)
        sims = jnp.where(gidx_rows[None, :] < limit, sims, -jnp.inf)
        scores, idx = jax.lax.top_k(sims, kk)                  # [Q, kk] local
        gidx = idx + s * chunk
        # Gather every shard's partials: [S, Q, kk] each.
        all_scores = jax.lax.all_gather(scores, axis)
        all_idx = jax.lax.all_gather(gidx, axis)
        qn = q.shape[0]
        flat_scores = jnp.moveaxis(all_scores, 0, 1).reshape(qn, size * kk)
        flat_idx = jnp.moveaxis(all_idx, 0, 1).reshape(qn, size * kk)
        top_scores, pos = jax.lax.top_k(flat_scores, min(k, size * kk))
        top_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
        return top_scores, top_idx

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(embeddings, queries)


def sharded_l2_topk(
    mesh: Mesh,
    embeddings: jax.Array,   # [N, D] row-sharded over `axis` (N % size == 0)
    queries: jax.Array,      # [Q, D] replicated
    k: int,
    valid_rows: int,
    axis: str = "model",
):
    """Exact squared-L2 top-k over a row-sharded corpus (the distributed
    form of exact.ExactIndex's ||q-x||^2 = ||q||^2 + ||x||^2 - 2 q.x).
    Rows >= ``valid_rows`` (shard padding) are masked to +inf so zero-vector
    padding can never win. Returns (distances [Q, k], global indices [Q, k])."""
    n = embeddings.shape[0]
    size = mesh.shape[axis]
    chunk = n // size
    kk = min(k, chunk)

    def local(emb_local, q):
        s = jax.lax.axis_index(axis)
        gidx_rows = s * chunk + jnp.arange(chunk)
        sims = jnp.dot(q, emb_local.T, preferred_element_type=jnp.float32)
        xn = jnp.sum(emb_local * emb_local, axis=1)
        qn = jnp.sum(q * q, axis=1, keepdims=True)
        dist = qn + xn[None, :] - 2.0 * sims
        dist = jnp.where(gidx_rows[None, :] < valid_rows, dist, jnp.inf)
        neg, idx = jax.lax.top_k(-dist, kk)                    # [Q, kk] local
        gidx = idx + s * chunk
        all_neg = jax.lax.all_gather(neg, axis)                # [S, Q, kk]
        all_idx = jax.lax.all_gather(gidx, axis)
        qn_rows = q.shape[0]
        flat_neg = jnp.moveaxis(all_neg, 0, 1).reshape(qn_rows, size * kk)
        flat_idx = jnp.moveaxis(all_idx, 0, 1).reshape(qn_rows, size * kk)
        top_neg, pos = jax.lax.top_k(flat_neg, min(k, size * kk))
        top_idx = jnp.take_along_axis(flat_idx, pos, axis=1)
        return -top_neg, top_idx

    return shard_map(
        local, mesh=mesh,
        in_specs=(P(axis, None), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )(embeddings, queries)


class ShardedExactIndex:
    """Exact retrieval over a row-sharded corpus with the standard index API
    (build / search / ntotal — drop-in for exact.ExactIndex, so the
    benchmark harness and the batched server work over a sharded corpus
    unchanged). Each device scores its local rows; only [S, k] partials are
    gathered (the classic distributed-MIPS reduction)."""

    def __init__(self, dim: int, mesh: Mesh | None = None, axis: str = "model"):
        if mesh is None:
            from ..parallel.mesh import make_mesh

            n_dev = len(jax.devices())
            mesh = make_mesh((1, n_dev))
        self.dim = dim
        self.mesh = mesh
        self.axis = axis
        self._emb: jax.Array | None = None
        self._orig = 0

    @property
    def ntotal(self) -> int:
        return self._orig

    def build(self, embeddings) -> None:
        self._emb, self._orig = shard_embeddings(self.mesh, embeddings,
                                                 axis=self.axis)

    def search(self, queries, k: int = 10):
        q = jnp.asarray(queries, dtype=jnp.float32)
        return sharded_l2_topk(self.mesh, self._emb, q, k,
                               valid_rows=self._orig, axis=self.axis)


def shard_embeddings(mesh: Mesh, embeddings, axis: str = "model"):
    """Pad rows to the axis size and place row-sharded. Returns
    (sharded array, original row count)."""
    import numpy as np

    from ..parallel.mesh import pad_to_multiple

    emb = np.asarray(embeddings)
    size = mesh.shape[axis]
    padded, orig = pad_to_multiple(emb, size)
    # Padding rows are zero vectors; pass the returned original row count as
    # ``valid_rows`` to the top-k functions so they are masked out (a zero
    # score CAN win signed similarity top-k when all real scores are negative).
    arr = jax.device_put(
        jnp.asarray(padded), NamedSharding(mesh, P(axis, None))
    )
    return arr, orig
