"""Hub-factorized importance pooling: dense head + sparse residual.

The >64k-row pooling path, superseding block tiling on power-law graphs.
Pooling is ``out = A @ h`` with A row-stochastic, K (~50) nonzeros per row
(reference model/pinsage.py:101-150, hot loop #3 in SURVEY.md §3). Measured
structure of A on MovieLens-shaped graphs (scripts/block_order_probe.py):

- Column mass is extremely heavy-tailed: the walk visit counts concentrate
  on popularity hubs, so the top ~4k columns carry ~90% of total pooling
  weight at any corpus size.
- The remaining per-row mass concentrates in each row's few heaviest
  personal neighbors — but those columns are *diffuse* across the corpus
  (block tilings can't capture them: the best 512-tile ordering still
  dropped 9.7% of mass where this factorization drops 0.45%).

So factor A = A_head + A_res:

    a_head [N, H]  — dense slab over the top-H mass columns (H ~ 4096):
                     one MXU matmul a_head @ h[head_ids], O(N*H) memory —
                     1 GB bf16 at 128k rows vs the 32 GB [N, N] full matrix.
    res    [N, R]  — each row's R heaviest non-head neighbors in the same
                     padded id/weight table format as gather pooling:
                     one tiny [N, R, D] gather.

Rows are renormalized over their kept entries (head + top-R residual), the
same filter-then-renormalize contract importance pooling applies to invalid
neighbors; the builder reports ``dropped_mass`` (the weight beyond both
parts — 0.5% at H=4096, R=8 on the 16k probe) so callers can fall back.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-12


def auto_head(n: int, dtype=jnp.bfloat16) -> int:
    """Head width used when ``head <= 0`` (config.ModelConfig.hub_pool_head):
    a fixed 4096 head drops 6.2% of mass at 59k rows; N/8 keeps the drop
    under ~1% through the measured range, capped for HBM. The cap is
    BYTE-denominated (32 KB of slab per row — 16384 cols in bf16), so an f8
    slab (``pool_matrix_dtype=float8_e4m3fn``) admits twice the columns at
    the same HBM footprint: at 256k rows that is head N/8 = 32768 where bf16
    caps at N/16 = 16384 — exactly the capacity margin that decides whether
    the r8 residual passes the 5% dropped-mass gate without escalation
    (measured at 256k: bf16 h16384 r8 drops 5.17%, RESULTS.md ladder).
    Single source of truth — bench.py's roofline model must use the same
    formula."""
    cap = 32768 // max(1, jnp.dtype(dtype).itemsize)
    return min(max(4096, n // 8), cap)


def resolve_pool_matrix_dtype(choice: str, n_rows: int, rung: str,
                              head_cfg: int = 0):
    """Resolve ``config.ModelConfig.pool_matrix_dtype`` to a jnp dtype.

    ``"auto"`` picks float8 exactly where it is a CAPACITY lever: the hub
    rung with the bf16 byte cap binding (``auto_head`` capped — n > 131072
    at the 32 KB/row budget) and the head not pinned by config. Measured at
    256k (RESULTS.md round-5 ladder): f8 admits head N/8 = 32768 at the
    same 8.6 GB slab, dropping 0.65% of mass at residual=8 — gate-passing
    at 139 ms/step where bf16 needs the x2 residual escalation (193 ms).
    Everywhere else bf16: at the same head f8 measured speed-neutral
    (109.7 vs 111.3 ms at 256k; ~0 at 59k — the step is not slab-read
    bound) and bf16 quantizes the coarse visit-count weights finer."""
    if choice == "auto":
        if (rung == "hub" and head_cfg <= 0
                and auto_head(n_rows, jnp.float8_e4m3fn)
                > auto_head(n_rows, jnp.bfloat16)):
            return jnp.float8_e4m3fn
        return jnp.bfloat16
    return {
        "bfloat16": jnp.bfloat16,
        "float8_e4m3fn": jnp.float8_e4m3fn,
    }[choice]


class HubPool(NamedTuple):
    """Pytree of device arrays (all leaves traced through jit)."""

    a_head: jax.Array    # [N, H] head pooling weights (compute dtype)
    head_ids: jax.Array  # [H] int32 table row id of each head column
    res_nbrs: jax.Array  # [N, R] int32 residual neighbor ids (clipped gather)
    res_w: jax.Array     # [N, R] f32 residual weights (0 = padding)


def build_hub_pool(
    nbrs: np.ndarray,      # [N, K] int neighbor ids (sentinel >= limit)
    weights: np.ndarray,   # [N, K] f32
    valid_limit: int | None = None,
    head: int = 4096,
    residual: int = 8,
    dtype=jnp.bfloat16,
) -> tuple[HubPool, dict]:
    """Factor the pooling matrix. Host-side index math (vectorized numpy),
    one 2-D device scatter into the bf16 head slab (no f32 intermediate,
    like dense_pool_matrix_direct).

    Returns (HubPool, stats) with ``dropped_mass`` = fraction of total
    pooling weight outside head + per-row top-``residual`` (0.0 = exact)."""
    nbrs = np.asarray(nbrs)
    weights = np.asarray(weights, np.float32)
    n, k = nbrs.shape
    if head <= 0:
        head = auto_head(n, dtype)
    h = int(min(head, n))
    r = int(min(residual, k))

    limit = n if valid_limit is None else min(valid_limit, n)
    valid = nbrs < limit
    w = np.where(valid, weights, 0.0)
    wsum = w.sum(axis=1, keepdims=True)
    w = np.where(wsum > 0, w / np.maximum(wsum, _EPS), 0.0)

    cols = np.clip(nbrs, 0, n - 1)
    col_mass = np.bincount(cols.reshape(-1), weights=w.reshape(-1),
                           minlength=n)
    head_ids = np.argsort(-col_mass, kind="stable")[:h].astype(np.int32)
    head_pos = np.full(n, -1, np.int64)
    head_pos[head_ids] = np.arange(h)

    in_head = (head_pos[cols] >= 0) & (w > 0)
    w_tail = np.where(~in_head & (w > 0), w, 0.0)
    # Per-row top-r residual entries (lightest tail beyond r is dropped).
    if r > 0:
        res_slot = np.argsort(-w_tail, axis=1, kind="stable")[:, :r]  # [N, r]
        res_w = np.take_along_axis(w_tail, res_slot, axis=1)
        res_ids = np.take_along_axis(cols, res_slot, axis=1).astype(np.int32)
        res_ids = np.where(res_w > 0, res_ids, 0)
    else:
        res_w = np.zeros((n, 1), np.float32)
        res_ids = np.zeros((n, 1), np.int32)

    total = float(w.sum())
    kept = float(w[in_head].sum()) + float(res_w.sum())
    dropped = 1.0 - kept / total if total > 0 else 0.0

    # Renormalize each row over its kept entries (head + residual).
    row_kept = (np.where(in_head, w, 0.0).sum(axis=1, keepdims=True)
                + res_w.sum(axis=1, keepdims=True))
    scale = np.where(row_kept > 0, 1.0 / np.maximum(row_kept, _EPS), 0.0)
    w_head = np.where(in_head, w, 0.0) * scale
    res_w = (res_w * scale).astype(np.float32)

    # 2-D scatter of head entries into the [N, H] slab (both dims and every
    # index far inside int32 — see block_sparse.build_block_pool).
    rows = np.repeat(np.arange(n, dtype=np.int64), k).reshape(n, k)[in_head]
    hcols = head_pos[cols][in_head]
    vals = w_head[in_head].astype(np.float32)

    @partial(jax.jit, static_argnames=("rows_n", "cols_n", "dtype"))
    def scatter(ridx, cidx, v, rows_n, cols_n, dtype):
        a = jnp.zeros((rows_n, cols_n), dtype=dtype)
        return a.at[ridx, cidx].add(v.astype(dtype))

    a_head = scatter(jnp.asarray(rows, jnp.int32), jnp.asarray(hcols, jnp.int32),
                     jnp.asarray(vals), rows_n=n, cols_n=h, dtype=dtype)

    hp = HubPool(
        a_head=a_head,
        head_ids=jnp.asarray(head_ids),
        res_nbrs=jnp.asarray(res_ids),
        res_w=jnp.asarray(res_w),
    )
    stats = {
        "dropped_mass": dropped,
        "head_cols": h,
        "residual_per_row": r,
        # Bytes of the slab AS BUILT (bf16). The trainer may cast it to
        # pool_matrix_dtype=float8 afterwards, halving the resident size —
        # named _built so the log is not mistaken for the final footprint.
        "a_bytes_built": n * h * a_head.dtype.itemsize,
        "head_mass": float(w[in_head].sum()) / total if total > 0 else 0.0,
    }
    return hp, stats


@partial(jax.jit, static_argnames=("limit", "h", "r", "dtype",
                                   "a_head_sharding"))
def _build_hub_pool_jit(nbrs, weights, limit, h, r, dtype,
                        a_head_sharding=None):
    n, k = nbrs.shape
    valid = nbrs < limit
    w = jnp.where(valid, weights.astype(jnp.float32), 0.0)
    wsum = w.sum(axis=1, keepdims=True)
    w = jnp.where(wsum > 0, w / jnp.maximum(wsum, _EPS), 0.0)
    cols = jnp.clip(nbrs, 0, n - 1).astype(jnp.int32)

    col_mass = jnp.zeros((n,), jnp.float32).at[cols.reshape(-1)].add(
        w.reshape(-1))
    _, head_ids = jax.lax.top_k(col_mass, h)
    head_ids = head_ids.astype(jnp.int32)
    head_pos = jnp.full((n,), -1, jnp.int32).at[head_ids].set(
        jnp.arange(h, dtype=jnp.int32))

    pos = jnp.take(head_pos, cols)                       # [N, K]
    in_head = (pos >= 0) & (w > 0)
    w_tail = jnp.where(~in_head & (w > 0), w, 0.0)
    res_w, res_slot = jax.lax.top_k(w_tail, r)           # [N, r] descending
    res_ids = jnp.take_along_axis(cols, res_slot, axis=1)
    res_ids = jnp.where(res_w > 0, res_ids, 0)

    total = w.sum()
    w_in_head = jnp.where(in_head, w, 0.0)
    head_mass = w_in_head.sum()
    dropped = jnp.where(
        total > 0, 1.0 - (head_mass + res_w.sum()) / jnp.maximum(total, _EPS),
        0.0)
    head_frac = jnp.where(total > 0, head_mass / jnp.maximum(total, _EPS), 0.0)

    row_kept = (w_in_head.sum(axis=1, keepdims=True)
                + res_w.sum(axis=1, keepdims=True))
    scale = jnp.where(row_kept > 0, 1.0 / jnp.maximum(row_kept, _EPS), 0.0)
    w_head = w_in_head * scale
    res_w = (res_w * scale).astype(jnp.float32)

    ridx = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[:, None], (n, k))
    pos_c = jnp.where(in_head, pos, h)                   # h = out of range
    a_head = jnp.zeros((n, h), dtype).at[
        ridx.reshape(-1), pos_c.reshape(-1)
    ].add(w_head.reshape(-1).astype(dtype), mode="drop")
    if a_head_sharding is not None:
        # Under a mesh GSPMD otherwise materializes the scatter output
        # REPLICATED — the full [N, H] slab on every device, i.e. the
        # per-device memory wall the row sharding exists to avoid (probed
        # on an 8-device CPU mesh). The constraint keeps the build
        # distributed end-to-end.
        a_head = jax.lax.with_sharding_constraint(a_head, a_head_sharding)
    return a_head, head_ids, res_ids, res_w, dropped, head_frac


def build_hub_pool_device(
    nbrs: jax.Array,       # [N, K] int neighbor ids (sentinel >= limit)
    weights: jax.Array,    # [N, K] f32
    valid_limit: int | None = None,
    head: int = 4096,
    residual: int = 8,
    dtype=jnp.bfloat16,
    a_head_sharding=None,  # NamedSharding for the [N, H] slab (mesh builds:
                           # without it GSPMD replicates the scatter output
                           # on every device — see _build_hub_pool_jit)
) -> tuple[HubPool, dict]:
    """``build_hub_pool`` executed entirely on device (one jitted program).

    The host builder round-trips the walk tables device->host (at 59k that
    is ~90 MB over the relay tunnel) and argsorts them in numpy — measured
    ~25-35 s per refresh at 59k, which eats the hub form's 4 ms/step win at
    small epoch budgets. This build is scatter/top_k on the accelerator:
    no transfer, no host sort; only the two stats scalars sync. Same
    factorization contract (ties in the head/residual selections may
    resolve differently — mass-equivalent, weight-identical on distinct
    weights)."""
    n, k = nbrs.shape
    if head <= 0:
        head = auto_head(n, dtype)
    if residual <= 0:   # degenerate config: host builder handles r=0
        return build_hub_pool(np.asarray(nbrs), np.asarray(weights),
                              valid_limit=valid_limit, head=head,
                              residual=residual, dtype=dtype)
    h = int(min(head, n))
    r = int(min(residual, k))
    limit = n if valid_limit is None else min(valid_limit, n)
    a_head, head_ids, res_ids, res_w, dropped, head_frac = _build_hub_pool_jit(
        nbrs, weights, limit=limit, h=h, r=r, dtype=dtype,
        a_head_sharding=a_head_sharding)
    hp = HubPool(a_head=a_head, head_ids=head_ids, res_nbrs=res_ids,
                 res_w=res_w)
    stats = {
        "dropped_mass": float(dropped),
        "head_cols": h,
        "residual_per_row": r,
        "a_bytes_built": n * h * a_head.dtype.itemsize,
        "head_mass": float(head_frac),
    }
    return hp, stats


def hub_pool_matmul(hp: HubPool, h: jax.Array, dtype=jnp.bfloat16,
                    gather_impl: str = "xla") -> jax.Array:
    """``A @ h`` through the hub factorization: one [N, H] x [H, D] MXU
    matmul over the head columns plus one [N, R, D] gather for the residual.
    Jit-traceable; AD gives the exact backward (head: transposed matmul;
    residual: scatter-add from the gather's VJP).

    ``gather_impl="pallas"`` streams the residual rows through the fused
    DMA-gather kernel (ops/pallas/pool.py) on backends where Mosaic
    compiles; weights are NOT renormalized by either path (the builder
    already renormalized jointly across head + residual)."""
    h_head = jnp.take(h.astype(dtype), hp.head_ids, axis=0)       # [H, D]
    out = jnp.dot(hp.a_head.astype(dtype), h_head,
                  preferred_element_type=jnp.float32)             # [N, D] f32
    res = None
    if gather_impl == "pallas":
        from ..core.backend import pallas_allowed

        if pallas_allowed():
            # Routes through the tunnel too when MRE_TUNNEL_PALLAS=1 (the
            # round-4 at-scale timing needs the kernel inside the real
            # train step; kernels proven correct on silicon in round 3).
            from .pallas.pool import gather_pool_ad

            interpret = jax.default_backend() != "tpu"
            res = gather_pool_ad(h.astype(dtype), hp.res_nbrs, hp.res_w,
                                 int(h.shape[0]), 8, interpret)
    if res is None:
        ce = jnp.take(h.astype(dtype), hp.res_nbrs, axis=0, mode="clip")
        res = jnp.einsum("nr,nrd->nd", hp.res_w, ce.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    return (out + res).astype(dtype)


def hub_pool_matmul_batch(hp: HubPool, h: jax.Array, batch_nodes: jax.Array,
                          dtype=jnp.bfloat16,
                          gather_impl: str = "xla") -> jax.Array:
    """Rows ``batch_nodes`` of ``hub_pool_matmul(hp, h)`` without pooling the
    full graph: rows of A are independent, so this is EXACTLY equal to
    ``jnp.take(hub_pool_matmul(hp, h), batch_nodes)`` while reading only a
    [B, H] slab row-gather (contiguous ~2H-byte rows — the access pattern
    TPUs gather well) + one [B, R, D] residual gather, instead of the full
    [N, H] slab matmul. This is the final-layer form
    (``model.hub_pool_final_layer``): the step's final-layer [B, K, D]
    scattered row gather is ~5 ms of the 22.9 ms 59k step (RESULTS.md
    "At-scale bottleneck after hub adoption"); the hub form replaces it
    with contiguous reads."""
    h_head = jnp.take(h.astype(dtype), hp.head_ids, axis=0)       # [H, D]
    a_b = jnp.take(hp.a_head, batch_nodes, axis=0, mode="clip")   # [B, H]
    out = jnp.dot(a_b.astype(dtype), h_head,
                  preferred_element_type=jnp.float32)             # [B, D] f32
    rb = jnp.take(hp.res_nbrs, batch_nodes, axis=0, mode="clip")  # [B, R]
    wb = jnp.take(hp.res_w, batch_nodes, axis=0, mode="clip")     # [B, R]
    res = None
    if gather_impl == "pallas":
        from ..core.backend import pallas_allowed

        if pallas_allowed():
            from .pallas.pool import gather_pool_ad

            interpret = jax.default_backend() != "tpu"
            res = gather_pool_ad(h.astype(dtype), rb, wb,
                                 int(h.shape[0]), 8, interpret)
    if res is None:
        ce = jnp.take(h.astype(dtype), rb, axis=0, mode="clip")   # [B, R, D]
        res = jnp.einsum("br,brd->bd", wb, ce.astype(jnp.float32),
                         preferred_element_type=jnp.float32)
    return (out + res).astype(dtype)
