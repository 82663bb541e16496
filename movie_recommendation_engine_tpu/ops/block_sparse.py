"""Block-sparse importance pooling: the >64k-row pooling path.

Pooling is ``out = A @ h`` with A row-stochastic, K (~50) nonzeros per row
(reference model/pinsage.py:101-150, hot loop #3 in SURVEY.md §3). On TPU the
two exact formulations hit walls as the corpus grows:

- dense [N, N] A (models/pinsage.dense_pool_matrix): MXU-fast but O(N^2)
  HBM — 32 GB bf16 at 128k rows, past v5e HBM.
- [N, K] gather + einsum (models/pinsage.importance_pool): O(N*K) memory but
  HBM-gather-bound (~45 GB/s effective for scattered 512 B rows, measured —
  ~94 ms/step at 59k, ~2x that at 128k).

This module keeps the matmul form without the N^2: nodes are re-ordered by a
feature k-means so that co-visited neighbors land in nearby columns, A is
tiled into [bs, cs] blocks, and each row-block keeps only its ``bmax``
heaviest column blocks:

    a_blocks [R, bmax, bs, cs]   (R = ceil(N / bs) row blocks)
    col_idx  [R, bmax]           which column block each slot holds

The step op is then ONE batched dense matmul
``einsum('rbic,rbcd->rid', a_blocks, h_blocks)`` plus a [R, bmax] gather of
*contiguous* [cs, D] slabs (256 KB each at cs=512/D=256 — the access shape
HBM likes, unlike the 512 B scattered rows of the gather form). Traffic is
O(N * bmax * cs) — independent of N^2 — and the FLOPs run on the MXU.

Exactness: when every row-block's neighbors fit in ``bmax`` column blocks
(true for ``bmax >= num_col_blocks``, and in practice for clustered graphs)
the result equals ``importance_pool`` bit-for-near-bit. Overflowing entries
(lowest-weight first) are dropped and the remaining row weights renormalized
— the same filter-then-renormalize contract the reference applies to invalid
neighbors; the builder reports the dropped mass so callers can fall back.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


class BlockPool(NamedTuple):
    """Pytree of device arrays (all leaves traced through jit)."""

    a_blocks: jax.Array   # [R, bmax, bs, cs] pooling weights (compute dtype)
    col_idx: jax.Array    # [R, bmax] int32 column-block ids (0 if unused slot)
    perm: jax.Array       # [R*bs] int32 new->old row id (pad rows = N)
    inv: jax.Array        # [N] int32 old->new row position


def cluster_permutation(
    features: np.ndarray | jax.Array,
    num_clusters: int = 0,
    seed: int = 0,
) -> np.ndarray:
    """Node order that groups feature-similar rows (device k-means +
    stable sort). Co-visited movies are content-similar in MovieLens-shaped
    graphs, so this concentrates each row-block's neighbor columns into few
    column blocks — the whole point of the tiling."""
    from ..retrieval.ivf import kmeans

    x = jnp.asarray(features, jnp.float32)
    n = int(x.shape[0])
    # Oversegment (many small clusters): plain-Lloyd merges of distant
    # communities are what scatter a row-block's columns (measured: a merged
    # 2-community cluster alternates labels row by row). Fine clusters are
    # pure; the greedy centroid chain below then re-concatenates sub-clusters
    # of one community adjacently, so oversegmentation costs nothing.
    p = num_clusters or max(min(n // 256, 4096), 64)
    p = min(p, n)
    centroids, assign = kmeans(x, jax.random.PRNGKey(seed), p)
    assign = np.asarray(assign)
    c = np.asarray(centroids)

    # Greedy nearest-neighbor chain over non-empty centroids: same-community
    # sub-clusters (centroid distance ~ intra-cluster noise << community
    # separation) are always picked consecutively.
    counts = np.bincount(assign, minlength=p)
    live = np.flatnonzero(counts > 0)
    cl = c[live]
    m = live.shape[0]
    from ..retrieval.ivf import pairwise_sq_dists

    d2 = pairwise_sq_dists(cl, cl)
    np.fill_diagonal(d2, np.inf)
    visited = np.zeros(m, bool)
    order = np.empty(m, np.int64)
    cur = 0
    for i in range(m):
        order[i] = cur
        visited[cur] = True
        d2[:, cur] = np.inf
        if i + 1 < m:
            cur = int(np.argmin(d2[cur]))
    rank = np.full(p, p, np.int64)
    rank[live[order]] = np.arange(m)
    return np.argsort(rank[assign], kind="stable").astype(np.int32)


def mass_permutation(
    nbrs: np.ndarray,      # [N, K] neighbor ids (sentinel >= limit)
    weights: np.ndarray,   # [N, K] f32
    valid_limit: int | None = None,
) -> np.ndarray:
    """Node order by descending total pooling mass per column. On power-law
    graphs the hub columns every row block needs land in the leading blocks
    (which the per-row-block top-``bmax`` selection then keeps), instead of
    being scattered across content clusters — measured dropped mass 0.031
    at 59k vs 0.373 for the feature-k-means order
    (scripts/block_order_probe.py)."""
    nbrs = np.asarray(nbrs)
    weights = np.asarray(weights, np.float32)
    n = nbrs.shape[0]
    limit = n if valid_limit is None else min(valid_limit, n)
    valid = nbrs < limit
    w = np.where(valid, weights, 0.0)
    wsum = w.sum(axis=1, keepdims=True)
    w = np.where(wsum > 0, w / np.maximum(wsum, _EPS), 0.0)
    col_mass = np.bincount(np.clip(nbrs, 0, n - 1).reshape(-1),
                           weights=w.reshape(-1), minlength=n)
    return np.argsort(-col_mass, kind="stable").astype(np.int32)


def build_block_pool(
    nbrs: np.ndarray,      # [N, K] int32/64 neighbor ids (sentinel >= limit)
    weights: np.ndarray,   # [N, K] f32
    perm: np.ndarray,      # [N] int32 new->old (from cluster_permutation)
    valid_limit: int | None = None,
    block_size: int = 512,
    max_blocks: int = 32,
    dtype=jnp.bfloat16,
) -> tuple[BlockPool, dict]:
    """Tile the pooling matrix. Host-side index math (vectorized numpy — a
    few seconds at 128k x 50), one device scatter into the bf16 block tensor
    (3 GB at 128k/bmax=32 — no f32 intermediate, like dense_pool_matrix_direct).

    Returns (BlockPool, stats) where stats reports ``dropped_mass`` — the
    fraction of total pooling weight that fell outside every row-block's top
    ``max_blocks`` column blocks (0.0 = exact)."""
    nbrs = np.asarray(nbrs)
    weights = np.asarray(weights, np.float32)
    n, k = nbrs.shape
    bs = cs = int(block_size)
    r_blocks = -(-max(n, 1) // bs)
    n_pad = r_blocks * bs
    ncb = r_blocks  # square tiling: same padded length on both axes
    bmax = int(min(max_blocks, ncb))

    limit = n if valid_limit is None else min(valid_limit, n)
    pos = np.empty(n, dtype=np.int64)
    pos[perm] = np.arange(n)

    # Mask invalid neighbors and renormalize (importance_pool semantics).
    valid = nbrs < limit
    w = np.where(valid, weights, 0.0)
    wsum = w.sum(axis=1, keepdims=True)
    w = np.where(wsum > 0, w / np.maximum(wsum, _EPS), 0.0)

    rows_new = pos[np.arange(n)]
    cols_new = pos[np.clip(nbrs, 0, n - 1)]
    rb = (rows_new // bs)[:, None].repeat(k, axis=1)       # [N, K]
    cb = cols_new // cs                                     # [N, K]

    # Weight mass per (row-block, col-block); keep each row-block's top bmax.
    mass = np.zeros((r_blocks, ncb), np.float32)
    np.add.at(mass, (rb.reshape(-1), cb.reshape(-1)), w.reshape(-1))
    if bmax < ncb:
        top = np.argpartition(-mass, bmax - 1, axis=1)[:, :bmax]
    else:
        top = np.broadcast_to(np.arange(ncb), (r_blocks, ncb)).copy()
    slot_map = np.full((r_blocks, ncb), -1, np.int16)
    np.put_along_axis(slot_map, top, np.arange(bmax, dtype=np.int16)[None, :]
                      .repeat(r_blocks, axis=0), axis=1)
    col_idx = np.sort(top, axis=1).astype(np.int32)
    # Re-derive slots from the sorted layout so gathers are ascending.
    slot_map[:] = -1
    np.put_along_axis(slot_map, col_idx, np.arange(bmax, dtype=np.int16)[None, :]
                      .repeat(r_blocks, axis=0), axis=1)

    slot = slot_map[rb.reshape(-1), cb.reshape(-1)].reshape(n, k)
    kept = (slot >= 0) & (w > 0)

    total_mass = float(w.sum())
    kept_mass = float(w[kept].sum())
    dropped = 1.0 - kept_mass / total_mass if total_mass > 0 else 0.0

    # Renormalize each row over its kept entries.
    row_kept = np.where(kept, w, 0.0).sum(axis=1, keepdims=True)
    w = np.where(row_kept > 0, w / np.maximum(row_kept, _EPS), 0.0)

    # 2-D scatter coordinates for the kept entries. NOT a single flat index:
    # r_blocks*bmax*bs*cs reaches 2^31 exactly at 128k rows (256*32*512*512)
    # and JAX indexing sizes/indices must fit int32 — the [rows, cs] split
    # keeps both dimensions (<= r_blocks*bmax*bs ~ 4.2M, cs = 512) and every
    # index comfortably inside int32 at any corpus this fits in HBM for.
    srow = ((rb[kept].astype(np.int64) * bmax + slot[kept]) * bs
            + (rows_new[:, None].repeat(k, axis=1)[kept] % bs))
    scol = cols_new[kept] % cs
    vals = w[kept].astype(np.float32)

    @partial(jax.jit, static_argnames=("rows", "cols", "dtype"))
    def scatter(ridx, cidx, v, rows, cols, dtype):
        a = jnp.zeros((rows, cols), dtype=dtype)
        return a.at[ridx, cidx].add(v.astype(dtype))

    a2 = scatter(jnp.asarray(srow, dtype=jnp.int32),
                 jnp.asarray(scol, dtype=jnp.int32),
                 jnp.asarray(vals),
                 rows=r_blocks * bmax * bs, cols=cs, dtype=dtype)
    a_blocks = a2.reshape(r_blocks, bmax, bs, cs)

    perm_pad = np.full(n_pad, n, np.int32)
    perm_pad[:n] = perm.astype(np.int32)
    bp = BlockPool(
        a_blocks=a_blocks,
        col_idx=jnp.asarray(col_idx),
        perm=jnp.asarray(perm_pad),
        inv=jnp.asarray(pos.astype(np.int32)),
    )
    stats = {
        "dropped_mass": dropped,
        "row_blocks": r_blocks,
        "col_blocks_kept": bmax,
        "col_blocks_total": ncb,
        "a_bytes": int(np.prod(a_blocks.shape)) * a_blocks.dtype.itemsize,
    }
    return bp, stats


def block_pool_matmul(bp: BlockPool, h: jax.Array, dtype=jnp.bfloat16) -> jax.Array:
    """``A @ h`` through the block tiling. Jit-traceable; AD gives the exact
    backward (d_h = A^T g via the transposed einsum + contiguous-slab
    scatter-add from the gather's VJP)."""
    n, d = h.shape
    r_blocks, bmax, bs, cs = bp.a_blocks.shape
    n_pad = r_blocks * bs
    # Permute rows into cluster order; pad rows clip-gather row n-1 but every
    # A entry addressing them is zero.
    h_p = jnp.take(h.astype(dtype), jnp.minimum(bp.perm, n - 1), axis=0)
    h_blocks = h_p.reshape(r_blocks, cs, d)  # square tiling: ncb == r_blocks
    gathered = jnp.take(h_blocks, bp.col_idx, axis=0)       # [R, bmax, cs, D]
    out_p = jnp.einsum(
        "rbic,rbcd->rid", bp.a_blocks.astype(dtype), gathered,
        preferred_element_type=jnp.float32,
    ).astype(dtype)                                          # [R, bs, D]
    out_flat = out_p.reshape(n_pad, d)
    return jnp.take(out_flat, bp.inv, axis=0)                # back to old order
