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
):
    """Exact inner-product top-k over a row-sharded corpus.

    Returns (scores [Q, k], global indices [Q, k]), replicated.
    """
    n = embeddings.shape[0]
    size = mesh.shape[axis]
    chunk = n // size
    kk = min(k, chunk)

    def local(emb_local, q):
        s = jax.lax.axis_index(axis)
        sims = jnp.dot(q, emb_local.T, preferred_element_type=jnp.float32)
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


def shard_embeddings(mesh: Mesh, embeddings, axis: str = "model"):
    """Pad rows to the axis size and place row-sharded. Returns
    (sharded array, original row count)."""
    import numpy as np

    from ..parallel.mesh import pad_to_multiple

    emb = np.asarray(embeddings)
    size = mesh.shape[axis]
    padded, orig = pad_to_multiple(emb, size)
    # Padding rows are zero vectors: they can never win a top-k over
    # unit-norm corpus rows for nonnegative scores; mask by -inf via a
    # sentinel trick is unnecessary for cosine-similarity use.
    arr = jax.device_put(
        jnp.asarray(padded), NamedSharding(mesh, P(axis, None))
    )
    return arr, orig
