"""Batched evaluation: Hit-Rate@k, scaled MRR, recommendations.

The reference evaluates one query at a time with a full [1, D] x [D, N]
matmul + top-k / full sort in a Python loop (utils/evaluation.py:5-73 — hot
loop #4 in SURVEY.md §3). Here all queries evaluate in one chunked
[Q, D] x [D, N] device program; ranks come from a similarity-count compare,
so no full sort is needed:

    rank(gt) = 1 + |{j : sim[j] > sim[gt]}|

which equals the reference's sort position for distinct scores (ties resolve
optimistically; scores are continuous so ties are measure-zero).

Metric definitions preserved exactly:
- HR@k for k in {10, 50, 100, 500} (config.py:44): gt within top-k.
- scaled MRR = mean(1 / (rank / scale)) with scale=100
  (utils/evaluation.py:66-69 — 100x classic MRR). Standard MRR is also
  reported (SURVEY.md §7 hard part 5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("chunk",))
def _ranks(
    embeddings: jax.Array,   # [N, D]
    query_idx: jax.Array,    # [Q] int32
    gt_idx: jax.Array,       # [Q] int32
    chunk: int = 1024,
) -> jax.Array:
    """[Q] int32 rank (1-based) of each ground-truth item among all items by
    dot-product similarity to the query."""
    n, d = embeddings.shape
    q = query_idx.shape[0]
    pad = (-q) % chunk
    qi = jnp.pad(query_idx, (0, pad))
    gi = jnp.pad(gt_idx, (0, pad))

    def body(carry, inputs):
        qc, gc = inputs
        qe = jnp.take(embeddings, qc, axis=0)              # [C, D]
        sims = qe @ embeddings.T                            # [C, N]
        gt_sim = jnp.sum(qe * jnp.take(embeddings, gc, axis=0), axis=1)
        rank = 1 + jnp.sum(sims > gt_sim[:, None], axis=1)
        return carry, rank

    _, ranks = jax.lax.scan(
        body, None,
        (qi.reshape(-1, chunk), gi.reshape(-1, chunk)),
    )
    return ranks.reshape(-1)[:q]


def evaluate_embeddings(
    embeddings,
    positive_pairs,            # [Q, 2] (query_idx, gt_idx)
    k_values=(10, 50, 100, 500),
    mrr_scale: float = 100.0,
    chunk: int = 1024,
) -> dict[str, float]:
    """Equivalent of utils/evaluation.py:75-104, one device program.

    Pairs whose query or gt index is out of range are dropped first —
    mirroring the reference's bounds filtering (run.py:531-545)."""
    emb = jnp.asarray(embeddings)
    pairs = np.asarray(positive_pairs)
    n = emb.shape[0]
    ok = (pairs[:, 0] >= 0) & (pairs[:, 0] < n) & (pairs[:, 1] >= 0) & (pairs[:, 1] < n)
    pairs = pairs[ok]
    if pairs.shape[0] == 0:
        out = {f"hit_rate@{k}": 0.0 for k in k_values}
        out.update({"mrr": 0.0, "mrr_standard": 0.0, "num_pairs": 0})
        return out
    ranks = np.asarray(
        _ranks(emb, jnp.asarray(pairs[:, 0], jnp.int32),
               jnp.asarray(pairs[:, 1], jnp.int32), chunk=min(chunk, 4096))
    ).astype(np.float64)
    out: dict[str, float] = {}
    for k in k_values:
        out[f"hit_rate@{k}"] = float((ranks <= k).mean())
    out["mrr"] = float((mrr_scale / ranks).mean())    # reference-scaled
    out["mrr_standard"] = float((1.0 / ranks).mean())
    out["num_pairs"] = int(ranks.shape[0])
    return out


@partial(jax.jit, static_argnames=("k", "exclude_query"))
def recommend(
    embeddings: jax.Array,   # [N, D]
    query_idx: jax.Array,    # [Q] int32
    k: int = 10,
    exclude_query: bool = True,
) -> tuple[jax.Array, jax.Array]:
    """Top-k recommendations per query (utils/evaluation.py:106-131),
    batched. Returns (scores [Q, k], indices [Q, k])."""
    qe = jnp.take(embeddings, query_idx, axis=0)
    sims = qe @ embeddings.T
    if exclude_query:
        n = embeddings.shape[0]
        onehot = jax.nn.one_hot(query_idx, n, dtype=sims.dtype)
        sims = jnp.where(onehot > 0, -jnp.inf, sims)
    return jax.lax.top_k(sims, k)
