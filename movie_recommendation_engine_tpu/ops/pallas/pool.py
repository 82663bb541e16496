"""Pallas TPU kernel: fused gather-weight-aggregate importance pooling.

Computes ``out[b] = sum_k w[b, k] * table[nbrs[b, k]]`` — the PinSage
importance-pooling core (reference ``model/pinsage.py:101-150``, hot loop #3
in SURVEY.md §3) as one kernel: neighbor feature rows are DMA'd from the HBM
feature table straight into VMEM row buffers (double-buffered per node, so
the next node's gathers overlap the current node's weighted reduction on the
MXU) and only the pooled [B, D] result is written back.

Why a kernel (the original hypothesis): the XLA gather formulation
materializes the [B, K, D] neighbor tensor in HBM before the einsum reduces
it (write [B,K,D] + read it back), and its scattered 512-byte row reads run
at ~45 GB/s effective (measured, CLAUDE.md). Here the gathered rows live
only in VMEM.

**Measured verdict (round 4, RESULTS.md "Pallas gather kernel inside the
real 59k train step"): the kernel LOSES — 59 ms/step vs 24 ms for the XLA
formulation in the same session, same shapes, on real silicon.** The
sublane-aligned rewrite DMAs the whole 8-row (f32) / 16-row (bf16) window
containing each neighbor (Mosaic rejects 1-row HBM slices) — an 8-16x read
amplification that erases the no-round-trip advantage — and issues DMAs
from a per-node scalar loop where XLA's gather is one batched op.
``gather_impl=auto`` therefore resolves to XLA; the kernel stays as an
explicit opt-in (it compiles and trains correctly — losses match XLA to
~1e-3 — so it remains a valid baseline for future shapes/hardware where
row sizes are sublane-aligned).

This is the gather-form complement to the dense-matrix MXU path
(models/pinsage.dense_pool_matrix): dense wins when the [N, N] pool matrix
fits HBM (trainer auto-selects it); the fused gather kernel targets corpora
too large for that. NOTE: callers must gate on
``core.backend.pallas_supported()`` — through the axon tunnel the kernel
compiles and runs correctly as of round 3 (probed: max err 1.4e-6 on the
chip) but only behind the ``MRE_TUNNEL_PALLAS=1`` opt-in, because remote
compiles can take many minutes; tests exercise the kernel in interpret
mode.

Sentinel convention: neighbor id >= ``valid_limit`` marks an empty slot — the
wrapper clamps the id (so the DMA address is in-bounds) and zeroes its
weight, preserving the reference's zero-contribution semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sublane(dtype) -> int:
    """Mosaic sublane tiling for a dtype: DMA slices of an HBM array must be
    whole multiples of this along dim 0 (probed on real v5e silicon:
    'Slice shape along dimension 0 must be aligned to tiling (8)')."""
    return 8 if jnp.dtype(dtype).itemsize >= 4 else 16


def _pool_kernel(base_ref, w_ref, table_ref, out_ref, rows, sems, *,
                 tile_b: int, k: int, sub: int):
    """One grid step pools ``tile_b`` nodes.

    base_ref: SMEM [tile_b, K] int32 BLOCK (a per-tile slice of the [B, K]
              block-index array — NOT whole-array scalar prefetch: SMEM is
              ~1 MB, and a train-step B of tens of thousands of rows
              overflows it; probed on real silicon at 59k: "Allocation
              (size=30208000) would exceed memory (size=1048576)", space=
              smem). Each entry is the BLOCK index of the ``sub``-row
              window containing the neighbor; the kernel multiplies by
              ``sub`` itself so Mosaic can prove the slice start divisible
              by the tiling (passing a pre-multiplied row failed that
              proof on real silicon).
    w_ref:   VMEM [tile_b, K*sub] f32 block — weights EXPANDED to one-hot
             position within each block (built XLA-side): w8[b, kk*sub+off]
             = w[b, kk] where off = row - base. Row selection thus happens
             in the MXU reduction, not via dynamic sublane indexing.
    table_ref: HBM [N, D] feature table (memory_space=ANY)
    out_ref: VMEM [tile_b, D] f32 block
    rows:    VMEM scratch [2, K*sub, D] (double buffer of gathered blocks)
    sems:    DMA semaphores [2, K]
    """

    def start_gathers(slot, b_local):
        def start_one(kk, _):
            start = base_ref[b_local, kk] * sub
            pltpu.make_async_copy(
                table_ref.at[pl.ds(start, sub)],
                rows.at[slot, pl.ds(kk * sub, sub)],
                sems.at[slot, kk],
            ).start()
            return 0

        jax.lax.fori_loop(0, k, start_one, 0)

    def wait_gathers(slot, b_local):
        def wait_one(kk, _):
            start = base_ref[b_local, kk] * sub
            pltpu.make_async_copy(
                table_ref.at[pl.ds(start, sub)],
                rows.at[slot, pl.ds(kk * sub, sub)],
                sems.at[slot, kk],
            ).wait()
            return 0

        jax.lax.fori_loop(0, k, wait_one, 0)

    start_gathers(0, 0)  # warm up the pipeline

    def body(b_local, _):
        slot = jax.lax.rem(b_local, 2)

        @pl.when(b_local + 1 < tile_b)
        def _():
            start_gathers(1 - slot, b_local + 1)

        wait_gathers(slot, b_local)
        # Weighted reduction of the K gathered blocks: [1, K*sub] @
        # [K*sub, D] on the MXU — the one-hot expansion zeroes every row of
        # each block except the wanted neighbor.
        w_row = w_ref[b_local, :].reshape(1, k * sub)
        # precision=HIGHEST: on real silicon the MXU's default is a single
        # bf16 multiply pass (probed: 2.6e-2 max err vs the f32 reference;
        # preferred_element_type only sets the ACCUMULATOR type). The
        # 3-pass f32-faithful product costs nothing here — the kernel is
        # DMA-bound.
        pooled = jnp.dot(
            w_row, rows[slot].astype(jnp.float32),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        out_ref[b_local, :] = pooled[0]
        return 0

    jax.lax.fori_loop(0, tile_b, body, 0)


@functools.partial(
    jax.jit, static_argnames=("valid_limit", "tile_b", "interpret")
)
def gather_pool(
    table: jax.Array,     # [N, D] feature rows (any float dtype)
    nbrs: jax.Array,      # [B, K] int32 neighbor ids (sentinel >= valid_limit)
    weights: jax.Array,   # [B, K] f32 importance weights
    valid_limit: int,
    tile_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """[B, D] f32 pooled rows: ``sum_k w[b,k] * table[nbrs[b,k]]``."""
    b, k = nbrs.shape
    n, d = table.shape
    sub = _sublane(table.dtype)
    # Clamp BOTH sides: a negative id would otherwise become an out-of-bounds
    # DMA source address (the XLA gather path clips; the kernel must too).
    w = jnp.where((nbrs >= valid_limit) | (nbrs < 0), 0.0,
                  weights.astype(jnp.float32))
    idx = jnp.clip(nbrs, 0, valid_limit - 1).astype(jnp.int32)
    # Mosaic requires HBM DMA slices whole-sublane-aligned along dim 0
    # (probed: real-chip error at 1-row slices). Copy the aligned sub-row
    # window containing each neighbor and select the row via a one-hot
    # expansion of the weights — the kernel then never indexes sublanes
    # dynamically. Pad the table so every row's natural window exists (the
    # pad is one [pad, D] zero strip — noise next to the gather itself).
    pad_n = (-n) % sub
    if pad_n:
        table = jnp.pad(table, ((0, pad_n), (0, 0)))
    blk = (idx // sub).astype(jnp.int32)
    off = idx - blk * sub                                    # [B,K] in [0,sub)
    w8 = jnp.zeros((b, k, sub), jnp.float32)
    w8 = jnp.put_along_axis(w8, off[..., None], w[..., None], axis=2,
                            inplace=False)
    w8 = w8.reshape(b, k * sub)

    pad_b = (-b) % tile_b
    if pad_b:
        blk = jnp.pad(blk, ((0, pad_b), (0, 0)))
        w8 = jnp.pad(w8, ((0, pad_b), (0, 0)))
    bp = b + pad_b

    out = pl.pallas_call(
        functools.partial(_pool_kernel, tile_b=tile_b, k=k, sub=sub),
        out_shape=jax.ShapeDtypeStruct((bp, d), jnp.float32),
        grid=(bp // tile_b,),
        in_specs=[
            # Per-tile SMEM block of the neighbor block indices (whole-array
            # scalar prefetch overflows the ~1 MB SMEM at train-step B —
            # see _pool_kernel docstring).
            pl.BlockSpec((tile_b, k), lambda i: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, k * sub), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),       # expanded weights
            pl.BlockSpec(memory_space=pl.ANY),           # table stays in HBM
        ],
        out_specs=pl.BlockSpec((tile_b, d), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, k * sub, d), table.dtype),
            pltpu.SemaphoreType.DMA((2, k)),
        ],
        interpret=interpret,
    )(blk, w8, table)
    return out[:b]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def gather_pool_ad(
    table: jax.Array,
    nbrs: jax.Array,
    weights: jax.Array,
    valid_limit: int,
    tile_b: int = 8,
    interpret: bool = False,
) -> jax.Array:
    """``gather_pool`` with a custom VJP, usable inside training steps.

    Forward runs the fused DMA-gather kernel; backward is expressed in XLA
    (scatter-add for the table cotangent, gather+dot for the weight
    cotangent) — a hand-written TPU scatter kernel buys nothing here since
    scatter-add measured strictly worse than XLA's on this workload
    (CLAUDE.md performance facts)."""
    return gather_pool(table, nbrs, weights, valid_limit, tile_b, interpret)


def _gather_pool_fwd(table, nbrs, weights, valid_limit, tile_b, interpret):
    out = gather_pool(table, nbrs, weights, valid_limit, tile_b, interpret)
    return out, (table, nbrs, weights)


def _gather_pool_bwd(valid_limit, tile_b, interpret, res, g):
    table, nbrs, weights = res
    n, d = table.shape
    valid = (nbrs >= 0) & (nbrs < valid_limit)
    w = jnp.where(valid, weights.astype(jnp.float32), 0.0)
    idx = jnp.clip(nbrs, 0, valid_limit - 1).astype(jnp.int32)
    g32 = g.astype(jnp.float32)
    # d_table[r] = sum over (b,k) with idx==r of w[b,k] * g[b,:]
    contrib = (w[..., None] * g32[:, None, :]).reshape(-1, d)
    d_table = jnp.zeros((n, d), jnp.float32).at[idx.reshape(-1)].add(contrib)
    # d_w[b,k] = <g[b], table[idx[b,k]]> at valid slots (masked slots saw 0).
    feats = jnp.take(table.astype(jnp.float32), idx, axis=0)
    d_w = jnp.einsum("bd,bkd->bk", g32, feats)
    d_w = jnp.where(valid, d_w, 0.0).astype(weights.dtype)
    return d_table.astype(table.dtype), None, d_w


gather_pool_ad.defvjp(_gather_pool_fwd, _gather_pool_bwd)
