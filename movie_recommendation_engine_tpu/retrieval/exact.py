"""Exact brute-force retrieval: one sharded matmul + top-k.

Replaces FAISS ``IndexFlatL2`` (reference utils/nearest_neighbors.py:176-181).
On TPU the whole corpus scan is an MXU matmul; squared-L2 distances derive
from inner products without materializing differences:

    ||q - x||^2 = ||q||^2 + ||x||^2 - 2 q.x
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


class ExactIndex:
    """API mirrors the reference index classes: build(embeddings) then
    search(queries, k) -> (distances, indices)."""

    def __init__(self, dim: int):
        self.dim = dim
        self._emb: jax.Array | None = None
        self._sqnorm: jax.Array | None = None

    @property
    def ntotal(self) -> int:
        return 0 if self._emb is None else int(self._emb.shape[0])

    def build(self, embeddings) -> None:
        self._emb = jnp.asarray(embeddings, dtype=jnp.float32)
        self._sqnorm = jnp.sum(self._emb * self._emb, axis=1)

    def search(self, queries, k: int = 10):
        q = jnp.asarray(queries, dtype=jnp.float32)
        d, i = _l2_topk(q, self._emb, self._sqnorm, k)
        return d, i


@partial(jax.jit, static_argnames=("k",))
def _l2_topk(q: jax.Array, emb: jax.Array, sqnorm: jax.Array, k: int):
    ip = jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
    qn = jnp.sum(q * q, axis=1, keepdims=True)
    dist = qn + sqnorm[None, :] - 2.0 * ip
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx


@partial(jax.jit, static_argnames=("k",))
def similarity_topk(q: jax.Array, emb: jax.Array, k: int):
    """Inner-product variant (equivalent ranking for unit-norm embeddings)."""
    sims = jnp.dot(q, emb.T, preferred_element_type=jnp.float32)
    return jax.lax.top_k(sims, k)
