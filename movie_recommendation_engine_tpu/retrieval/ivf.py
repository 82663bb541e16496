"""IVF / "Weak AND" two-level retrieval on device.

Replaces FAISS ``IndexIVFFlat`` with an ``IndexFlatL2`` coarse quantizer
(reference utils/nearest_neighbors.py:70-139; defaults: 100 partitions,
nprobe = min(partitions, 20) at :134). TPU design:

- **train**: k-means (k-means++ style seeding + Lloyd iterations) runs as
  jitted [N, D] x [D, P] matmuls + argmin + segment-sum — the MXU does the
  assignment step, no host loops.
- **add**: items are *physically reordered* by cluster so each inverted list
  is a contiguous range of the embedding table (CSR-of-clusters). That turns
  list probing into contiguous dynamic slices — the layout HBM likes.
- **search**: top-``nprobe`` centroids per query, gather a fixed-budget
  candidate block per probed list (padded, masked), exact L2 on candidates,
  top-k. Entirely on device; the fixed candidate budget replaces FAISS's
  ragged list traversal.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("num_clusters", "iters"))
def kmeans(x: jax.Array, key: jax.Array, num_clusters: int, iters: int = 15):
    """Lloyd k-means; returns (centroids [P, D], assignments [N])."""
    n, d = x.shape
    init_idx = jax.random.choice(key, n, shape=(num_clusters,), replace=False)
    centroids = jnp.take(x, init_idx, axis=0)

    def step(centroids, _):
        dist = (
            jnp.sum(x * x, axis=1, keepdims=True)
            - 2.0 * jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
            + jnp.sum(centroids * centroids, axis=1)[None, :]
        )
        assign = jnp.argmin(dist, axis=1)
        sums = jax.ops.segment_sum(x, assign, num_segments=num_clusters)
        counts = jax.ops.segment_sum(
            jnp.ones((n,), jnp.float32), assign, num_segments=num_clusters
        )
        new_c = jnp.where(counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0),
                          centroids)
        return new_c, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    dist = (
        jnp.sum(x * x, axis=1, keepdims=True)
        - 2.0 * jnp.dot(x, centroids.T, preferred_element_type=jnp.float32)
        + jnp.sum(centroids * centroids, axis=1)[None, :]
    )
    return centroids, jnp.argmin(dist, axis=1)


class WeakANDIndex:
    """build(embeddings) / search(queries, k) mirroring the reference class
    (utils/nearest_neighbors.py:70-139)."""

    def __init__(self, dim: int, num_partitions: int = 100,
                 candidates_factor: int = 0, nprobe: int = 20, seed: int = 0):
        self.dim = dim
        self.num_partitions = num_partitions
        self.candidates_factor = candidates_factor
        self.nprobe = min(num_partitions, nprobe)
        self.seed = seed
        self._emb = None          # reordered embeddings [N, D]
        self._perm = None         # original index per reordered row [N]
        self._offsets = None      # [P+1] list offsets into the reordered table
        self._centroids = None
        self._max_list = 0

    @property
    def ntotal(self) -> int:
        return 0 if self._emb is None else int(self._emb.shape[0])

    def build(self, embeddings) -> None:
        x = jnp.asarray(embeddings, dtype=jnp.float32)
        n = x.shape[0]
        p = min(self.num_partitions, n)
        centroids, assign = kmeans(x, jax.random.PRNGKey(self.seed), p)
        assign_np = np.asarray(assign)
        # Order each inverted list by distance to its centroid so the
        # fixed candidate budget (k * candidates_factor, see search) keeps
        # the most central rows when it truncates a long list.
        x_np = np.asarray(x)
        c_np = np.asarray(centroids)
        d_own = np.sum((x_np - c_np[assign_np]) ** 2, axis=1)
        order = np.lexsort((d_own, assign_np))
        counts = np.bincount(assign_np, minlength=p)
        offsets = np.zeros(p + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        self._emb = jnp.take(x, jnp.asarray(order), axis=0)
        self._perm = jnp.asarray(order.astype(np.int32))
        self._offsets = jnp.asarray(offsets.astype(np.int32))
        self._centroids = centroids
        self._max_list = int(counts.max()) if n else 0

    def search(self, queries, k: int = 10):
        q = jnp.asarray(queries, dtype=jnp.float32)
        # candidates_factor bounds the per-probed-list scan budget to
        # k * factor rows (the Weak-AND candidate cap): latency/recall knob.
        budget = self._max_list
        if self.candidates_factor:
            budget = min(budget, max(k * self.candidates_factor, k))
        d, local = _ivf_search(
            q, self._emb, self._centroids, self._offsets,
            nprobe=self.nprobe, max_list=budget, k=k,
        )
        ids = jnp.take(self._perm, jnp.maximum(local, 0), mode="clip")
        return d, jnp.where(local < 0, -1, ids)


@partial(jax.jit, static_argnames=("nprobe", "max_list", "k"))
def _ivf_search(
    q: jax.Array,           # [Q, D]
    emb: jax.Array,         # [N, D] cluster-ordered
    centroids: jax.Array,   # [P, D]
    offsets: jax.Array,     # [P+1]
    nprobe: int,
    max_list: int,
    k: int,
):
    qn, d = q.shape
    n = emb.shape[0]
    # Coarse quantizer: L2 to centroids, take nprobe nearest.
    cd = (
        jnp.sum(q * q, axis=1, keepdims=True)
        - 2.0 * jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
        + jnp.sum(centroids * centroids, axis=1)[None, :]
    )
    _, probe = jax.lax.top_k(-cd, nprobe)                     # [Q, nprobe]

    starts = jnp.take(offsets, probe)                          # [Q, nprobe]
    ends = jnp.take(offsets, probe + 1)
    # Fixed candidate budget per probed list.
    slot = jnp.arange(max_list, dtype=jnp.int32)               # [L]
    cand = starts[:, :, None] + slot[None, None, :]            # [Q, nprobe, L]
    valid = cand < ends[:, :, None]
    cand_flat = jnp.where(valid, cand, 0).reshape(qn, -1)      # [Q, C]
    valid_flat = valid.reshape(qn, -1)

    cemb = jnp.take(emb, cand_flat, axis=0, mode="clip")       # [Q, C, D]
    dist = (
        jnp.sum(q * q, axis=1, keepdims=True)
        - 2.0 * jnp.einsum("qd,qcd->qc", q, cemb, preferred_element_type=jnp.float32)
        + jnp.sum(cemb * cemb, axis=2)
    )
    dist = jnp.where(valid_flat, dist, jnp.inf)
    kk = min(k, dist.shape[1])
    neg, pos = jax.lax.top_k(-dist, kk)
    idx = jnp.take_along_axis(cand_flat, pos, axis=1)
    dd = -neg
    if kk < k:
        dd = jnp.pad(dd, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - kk)), constant_values=-1)
    # FAISS returns -1 ids for missing results.
    idx = jnp.where(jnp.isfinite(dd), idx, -1)
    return dd, idx
