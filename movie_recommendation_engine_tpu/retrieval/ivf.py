"""IVF / "Weak AND" two-level retrieval on device.

Replaces FAISS ``IndexIVFFlat`` with an ``IndexFlatL2`` coarse quantizer
(reference utils/nearest_neighbors.py:70-139; defaults: 100 partitions,
nprobe = min(partitions, 20) at :134). TPU design:

- **train**: k-means (Lloyd iterations) runs as jitted [N, D] x [D, P]
  matmuls + argmin + segment-sum — the MXU does the assignment step.
- **balance**: inverted lists are size-capped (``balance_factor`` x the mean
  list size; host-side overflow spill to the next-nearest centroid with
  room). Skewed k-means otherwise makes the largest cluster the per-probe
  scan budget — at 59k items / 100 partitions a 5k-row cluster would turn
  one search into a multi-GB candidate gather.
- **add**: items are *physically reordered* by cluster so each inverted list
  is a contiguous range of the embedding table (CSR-of-clusters). That turns
  list probing into contiguous dynamic slices — the layout HBM likes.
- **search**: top-``nprobe`` centroids per query, then ONE probed list per
  scan step: gather its fixed-budget candidate block, exact L2, merge into a
  running top-k (``lax.scan`` over probes). Peak transient is a single
  [Q, budget, D] block — independent of nprobe — instead of the old
  [Q, nprobe * budget, D] monolith.
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


def pairwise_sq_dists(x: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Host-side [N, P] squared L2 distances via the three-term expansion
    |x|^2 - 2 x.c + |c|^2, clamped at 0 (cancellation on near-duplicate rows
    can go slightly negative). Shared by build-time balancing and the
    block-pool cluster ordering; the jitted k-means/search paths keep their
    in-program formulations."""
    d2 = (
        np.sum(x * x, axis=1, keepdims=True)
        - 2.0 * x @ c.T
        + np.sum(c * c, axis=1)[None, :]
    )
    return np.maximum(d2, 0.0)


def balance_assignments(
    x: np.ndarray,          # [N, D]
    centroids: np.ndarray,  # [P, D]
    assign: np.ndarray,     # [N] int
    cap: int,
) -> np.ndarray:
    """Spill rows beyond ``cap`` per cluster to their next-nearest centroid
    with room. Host-side, one-time at build. Overfull clusters keep their
    ``cap`` most-central rows (so the centroid stays representative); each
    spilled row re-homes to the nearest centroid under cap — with nprobe=20
    of 100 lists probed, a 2nd/3rd-nearest home is still found by the coarse
    quantizer with high probability (recall covered by tests)."""
    p = centroids.shape[0]
    # Feasibility floor: with cap * P < N there is not enough room anywhere
    # and rows would silently stay in their overfull list (violating the
    # promised scan-budget bound). ceil(N/P) is the tightest honorable cap.
    cap = max(cap, -(-x.shape[0] // p))
    counts = np.bincount(assign, minlength=p)
    if counts.max(initial=0) <= cap:
        return assign
    assign = assign.copy()
    # Full [N, P] distance table: 59k x 100 f32 = 24 MB — cheap at build.
    d2 = pairwise_sq_dists(x, centroids)
    room = cap - counts
    spilled: list[int] = []
    for c in np.flatnonzero(counts > cap):
        rows = np.flatnonzero(assign == c)
        order = np.argsort(d2[rows, c], kind="stable")
        for r in rows[order[cap:]]:
            spilled.append(int(r))
        room[c] = 0
    # Re-home farthest-first is unnecessary; any stable order works since
    # each row independently takes its nearest centroid with room.
    for r in spilled:
        for c in np.argsort(d2[r]):
            if room[c] > 0:
                assign[r] = c
                room[c] -= 1
                break
    return assign


class WeakANDIndex:
    """build(embeddings) / search(queries, k) mirroring the reference class
    (utils/nearest_neighbors.py:70-139).

    ``balance_factor`` caps every inverted list at
    ``ceil(balance_factor * N / P)`` rows (0 disables balancing — the raw
    k-means layout, whose largest cluster then sets the scan budget).
    """

    def __init__(self, dim: int, num_partitions: int = 100,
                 candidates_factor: int = 0, nprobe: int = 20, seed: int = 0,
                 balance_factor: float = 4.0):
        self.dim = dim
        self.num_partitions = num_partitions
        self.candidates_factor = candidates_factor
        self.nprobe = min(num_partitions, nprobe)
        self.seed = seed
        self.balance_factor = balance_factor
        self._emb = None          # reordered embeddings [N, D]
        self._norm2 = None        # [N] precomputed squared norms
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
        x_np = np.asarray(x)
        c_np = np.asarray(centroids)
        if self.balance_factor and n:
            cap = max(1, int(np.ceil(self.balance_factor * n / p)))
            assign_np = balance_assignments(x_np, c_np, assign_np, cap)
        # Order each inverted list by distance to its centroid so the
        # fixed candidate budget (k * candidates_factor, see search) keeps
        # the most central rows when it truncates a long list.
        d_own = np.sum((x_np - c_np[assign_np]) ** 2, axis=1)
        order = np.lexsort((d_own, assign_np))
        counts = np.bincount(assign_np, minlength=p)
        offsets = np.zeros(p + 1, dtype=np.int64)
        np.cumsum(counts, out=offsets[1:])
        self._emb = jnp.take(x, jnp.asarray(order), axis=0)
        self._norm2 = jnp.sum(self._emb * self._emb, axis=1)
        self._perm = jnp.asarray(order.astype(np.int32))
        self._offsets = jnp.asarray(offsets.astype(np.int32))
        self._centroids = centroids
        self._max_list = int(counts.max()) if n else 0

    def search(self, queries, k: int = 10):
        q = jnp.asarray(queries, dtype=jnp.float32)
        # candidates_factor bounds the per-probed-list scan budget to
        # k * factor rows (the Weak-AND candidate cap): latency/recall knob.
        # With balancing on, the default full-list budget is already capped
        # at ceil(balance_factor * N / P).
        budget = max(self._max_list, 1)
        if self.candidates_factor:
            budget = min(budget, max(k * self.candidates_factor, k))
        # local->original id mapping happens INSIDE the jitted program: each
        # eager op after it would cost one more relay round-trip (~50 ms)
        # per single-request search on the tunnel backend.
        return _ivf_search(
            q, self._emb, self._norm2, self._centroids, self._offsets,
            self._perm, nprobe=self.nprobe, max_list=budget, k=k,
        )


@partial(jax.jit, static_argnames=("nprobe", "max_list", "k"))
def _ivf_search(
    q: jax.Array,           # [Q, D]
    emb: jax.Array,         # [N, D] cluster-ordered
    norm2: jax.Array,       # [N]
    centroids: jax.Array,   # [P, D]
    offsets: jax.Array,     # [P+1]
    perm: jax.Array,        # [N] original id per reordered row
    nprobe: int,
    max_list: int,
    k: int,
):
    qn, d = q.shape
    # Coarse quantizer: L2 to centroids, take nprobe nearest.
    cd = (
        jnp.sum(q * q, axis=1, keepdims=True)
        - 2.0 * jnp.dot(q, centroids.T, preferred_element_type=jnp.float32)
        + jnp.sum(centroids * centroids, axis=1)[None, :]
    )
    _, probe = jax.lax.top_k(-cd, nprobe)                      # [Q, nprobe]
    starts = jnp.take(offsets, probe)                          # [Q, nprobe]
    ends = jnp.take(offsets, probe + 1)

    q_norm2 = jnp.sum(q * q, axis=1, keepdims=True)            # [Q, 1]
    slot = jnp.arange(max_list, dtype=jnp.int32)               # [L]
    kk = min(k, nprobe * max_list)

    def one_probe(carry, se):
        best_d, best_i = carry                                 # [Q, kk] each
        s, e = se                                              # [Q] each
        cand = s[:, None] + slot[None, :]                      # [Q, L]
        valid = cand < e[:, None]
        cand = jnp.where(valid, cand, 0)
        cemb = jnp.take(emb, cand, axis=0, mode="clip")        # [Q, L, D]
        dist = (
            q_norm2
            - 2.0 * jnp.einsum("qd,qld->ql", q, cemb,
                               preferred_element_type=jnp.float32)
            + jnp.take(norm2, cand, mode="clip")
        )
        dist = jnp.where(valid, dist, jnp.inf)
        # Merge this probe's candidates into the running top-k.
        all_d = jnp.concatenate([best_d, dist], axis=1)
        all_i = jnp.concatenate([best_i, cand], axis=1)
        neg, pos = jax.lax.top_k(-all_d, kk)
        return (-neg, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (
        jnp.full((qn, kk), jnp.inf, jnp.float32),
        jnp.zeros((qn, kk), jnp.int32),
    )
    (dd, idx), _ = jax.lax.scan(one_probe, init, (starts.T, ends.T))
    if kk < k:
        dd = jnp.pad(dd, ((0, 0), (0, k - kk)), constant_values=jnp.inf)
        idx = jnp.pad(idx, ((0, 0), (0, k - kk)), constant_values=-1)
    # Map reordered-row ids back to original ids; FAISS returns -1 ids for
    # missing results.
    ids = jnp.take(perm, jnp.maximum(idx, 0), mode="clip")
    ids = jnp.where(jnp.isfinite(dd) & (idx >= 0), ids, -1)
    return dd, ids
