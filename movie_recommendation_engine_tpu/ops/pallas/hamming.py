"""Pallas TPU kernel: multi-table Hamming distance for LSH retrieval.

Computes ``dist[q, n] = min_t popcount(qsig[q, t] ^ sigs[n, t])`` over packed
uint32 signatures — the scoring core of the LSH index
(retrieval/lsh.py, replacing FAISS IndexLSH per reference
utils/nearest_neighbors.py:7-68).

Why a kernel: the XLA formulation materializes a [Q, N, T, W] XOR
intermediate in HBM (or forces an awkward scan). Here each grid step keeps a
[TQ, TN] tile's entire XOR/popcount/min pipeline in VMEM: signatures stream
from HBM once, integer ops run on the VPU, only the [Q, N] distance matrix is
written back.

Layout: signatures are [rows, T*W] uint32 with table t occupying columns
[t*W, (t+1)*W). Tiles are padded to the uint32 sublane/lane shape (8, 128).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _hamming_kernel(q_ref, s_ref, out_ref, *, num_tables: int, words: int):
    q = q_ref[:]          # [TQ, T*W] uint32
    s = s_ref[:]          # [TN, T*W] uint32
    tq = q.shape[0]
    tn = s.shape[0]
    best = jnp.full((tq, tn), jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    for t in range(num_tables):
        # Accumulate word-by-word over a [TQ, TN] tile: the obvious
        # [TQ, TN, W] XOR intermediate overallocated scoped VMEM on real
        # silicon (probed); per-word broadcasts keep the live set at two
        # [TQ, TN] i32 buffers regardless of W.
        acc = jnp.zeros((tq, tn), jnp.int32)
        for wi in range(words):
            col = t * words + wi
            x = jnp.bitwise_xor(q[:, col][:, None], s[:, col][None, :])
            acc = acc + jax.lax.population_count(x).astype(jnp.int32)
        best = jnp.minimum(best, acc)
    out_ref[:] = best


@functools.partial(
    jax.jit, static_argnames=("num_tables", "words", "tile_q", "tile_n", "interpret")
)
def hamming_distance(
    qsig: jax.Array,      # [Q, T*W] uint32
    sigs: jax.Array,      # [N, T*W] uint32
    num_tables: int,
    words: int,
    tile_q: int = 128,
    tile_n: int = 512,
    interpret: bool = False,
) -> jax.Array:
    """[Q, N] int32 min-table Hamming distances."""
    q, n = qsig.shape[0], sigs.shape[0]
    pad_q = (-q) % tile_q
    pad_n = (-n) % tile_n
    qp = jnp.pad(qsig, ((0, pad_q), (0, 0)))
    sp = jnp.pad(sigs, ((0, pad_n), (0, 0)))
    tw = qp.shape[1]

    grid = (qp.shape[0] // tile_q, sp.shape[0] // tile_n)
    out = pl.pallas_call(
        functools.partial(_hamming_kernel, num_tables=num_tables, words=words),
        out_shape=jax.ShapeDtypeStruct((qp.shape[0], sp.shape[0]), jnp.int32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_q, tw), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, tw), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_q, tile_n), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(qp, sp)
    return out[:q, :n]


def hamming_topk(
    qsig: jax.Array,
    sigs: jax.Array,
    k: int,
    num_tables: int,
    words: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """(distances [Q, k], indices [Q, k]) — kernel distances + lax.top_k."""
    dist = hamming_distance(qsig, sigs, num_tables, words, interpret=interpret)
    neg, idx = jax.lax.top_k(-dist, k)
    return -neg, idx
