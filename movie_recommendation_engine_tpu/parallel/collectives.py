"""Explicit collectives for row-sharded tables.

XLA's SPMD partitioner handles most gathers automatically once shardings are
annotated; this module provides the explicit ``shard_map`` fallback for the
cross-shard neighbor-feature gather (SURVEY.md §2b: "row-sharded
feature/embedding tables with all-to-all neighbor gathers") for cases where
we want to pin the collective choice instead of trusting the partitioner.

``sharded_gather``: each shard holds rows [s*C, (s+1)*C) of the table; for a
global index i, exactly one shard contributes a nonzero row; summing the
masked local gathers over the model axis (one psum, riding ICI) yields the
full gather. Cost: one [B, D] psum instead of all-gathering the [N, D] table.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def sharded_gather(mesh: Mesh, table: jax.Array, idx: jax.Array,
                   axis: str = "model") -> jax.Array:
    """table: [N, D] row-sharded over ``axis`` (N divisible by axis size);
    idx: [B] replicated int32. Returns [B, D] replicated rows."""

    n = table.shape[0]
    size = mesh.shape[axis]
    chunk = n // size

    def local(table_local, idx_rep):
        s = jax.lax.axis_index(axis)
        lo = s * chunk
        local_idx = idx_rep - lo
        in_shard = (local_idx >= 0) & (local_idx < chunk)
        safe = jnp.clip(local_idx, 0, chunk - 1)
        rows = jnp.take(table_local, safe, axis=0)
        rows = jnp.where(in_shard[:, None], rows, 0.0)
        return jax.lax.psum(rows, axis)

    specs_in = (P(axis, None), P())
    return shard_map(
        local, mesh=mesh, in_specs=specs_in, out_specs=P(), check_vma=False
    )(table, idx)


def ring_shift(mesh: Mesh, x: jax.Array, axis: str = "model",
               shift: int = 1) -> jax.Array:
    """[S, B, D] sharded over ``axis`` on dim 0: each shard's block moves
    ``shift`` positions around the ring (one ppermute over ICI). Building
    block for rotation-based cross-shard neighbor exchange at pod scale."""
    size = mesh.shape[axis]
    perm = [(i, (i + shift) % size) for i in range(size)]

    def local(block):
        return jax.lax.ppermute(block, axis, perm)

    return shard_map(
        local, mesh=mesh, in_specs=(P(axis, None, None),),
        out_specs=P(axis, None, None), check_vma=False,
    )(x)
