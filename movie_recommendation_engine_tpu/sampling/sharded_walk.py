"""Row-sharded CSR random walks: the graph-memory half of the 10M-item plan.

The replicated ``DeviceGraph`` is the multi-chip trainer's memory wall
(docs/DESIGN.md "Replicated-CSR wall"): feature/neighbor tables and pool
slabs row-shard over the ``model`` axis, but the O(E) CSR used by in-step
hard-negative walks and per-epoch table refreshes was copied to every
device — ~11 GiB/chip at 10M items / 10^9 edges, regardless of mesh size.

This module shards the CSR by ROW RANGE over the model axis and walks it
with the same masked-psum pattern as ``parallel.collectives.sharded_gather``:

- Shard ``s`` holds rows ``[s*C, (s+1)*C)`` — a local ``[C+1]`` indptr
  (rebased to shard-local edge offsets) plus its ``[E_s]`` slice of
  indices/cumprob/weights, padded to the max shard edge count so the
  stacked arrays are rectangular (padding rows have degree 0).
- Walker state is REPLICATED (each chip advances the full walker batch).
  Per hop, every shard answers the weighted-categorical binary search for
  the walkers whose current node it owns and contributes 0 for the rest;
  one ``psum`` over ICI merges the answers. Communication per hop is the
  [B*W] int32 walker frontier (~400 KB at the 59k production shapes) —
  nothing E-sized ever moves.
- The binary search reads the SAME per-row cumprob values as the
  replicated walk and the per-step uniforms come from the SAME key, so
  the sharded walk is BIT-IDENTICAL to ``random_walk.random_walks``
  (tests/test_sharded_walk.py asserts exact equality). Compute is
  duplicated ``size``-fold (each shard runs the search for all walkers),
  but the walk search is a few gathers per hop — memory, not FLOPs, is
  the wall this removes.

Reference obligation: ``utils/random_walk.py:52-142`` semantics at scales
the reference never reaches (SURVEY.md §5 graph-size axis).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..graph.csr import CSRGraph


@jax.tree_util.register_pytree_node_class
class ShardedDeviceGraph:
    """CSR adjacency row-sharded over a mesh axis.

    Array leaves (stacked per shard, sharded ``P(axis, None)``):
      indptr  [S, C+1] int32 — shard-LOCAL edge offsets (indptr[s, 0] == 0)
      indices [S, Emax] int32 — global neighbor ids
      cumprob [S, Emax] f32  — per-row cumulative transition probabilities
      weights [S, Emax] f32  — raw edge weights

    ``mesh``/``axis``/``num_nodes`` ride the treedef (static under jit), so
    walk code can dispatch on the type and recover the mesh at trace time.
    """

    def __init__(self, indptr, indices, cumprob, weights, *, mesh: Mesh,
                 axis: str, num_nodes: int):
        self.indptr = indptr
        self.indices = indices
        self.cumprob = cumprob
        self.weights = weights
        self.mesh = mesh
        self.axis = axis
        self._num_nodes = int(num_nodes)

    def tree_flatten(self):
        return ((self.indptr, self.indices, self.cumprob, self.weights),
                (self.mesh, self.axis, self._num_nodes))

    @classmethod
    def tree_unflatten(cls, aux, leaves):
        mesh, axis, num_nodes = aux
        return cls(*leaves, mesh=mesh, axis=axis, num_nodes=num_nodes)

    @property
    def num_nodes(self) -> int:
        return self._num_nodes

    @property
    def sentinel(self) -> int:
        return self._num_nodes

    @property
    def rows_per_shard(self) -> int:
        return int(self.indptr.shape[1] - 1)


def sharded_device_graph(csr: CSRGraph, mesh: Mesh,
                         axis: str = "model") -> ShardedDeviceGraph:
    """Split a host CSR into per-shard row ranges and place the stacked
    arrays row-sharded over ``axis`` (each device holds ONE shard's slice —
    per-device CSR bytes drop by the axis size)."""
    size = int(mesh.shape[axis])
    indptr = np.asarray(csr.indptr, np.int64)
    n = indptr.shape[0] - 1
    c = max(1, -(-n // size))                      # ceil rows per shard
    counts = []
    for s in range(size):
        r0, r1 = min(s * c, n), min((s + 1) * c, n)
        counts.append(int(indptr[r1] - indptr[r0]))
    emax = max(max(counts), 1)

    ip_s = np.zeros((size, c + 1), np.int32)
    ind_s = np.zeros((size, emax), np.int32)
    cp_s = np.ones((size, emax), np.float32)       # pad never read (deg=0)
    w_s = np.zeros((size, emax), np.float32)
    for s in range(size):
        r0, r1 = min(s * c, n), min((s + 1) * c, n)
        e0, e1 = int(indptr[r0]), int(indptr[r1])
        local = (indptr[r0:r1 + 1] - e0).astype(np.int32)
        ip_s[s, : r1 - r0 + 1] = local
        ip_s[s, r1 - r0 + 1:] = local[-1] if local.size else 0
        ind_s[s, : e1 - e0] = csr.indices[e0:e1]
        cp_s[s, : e1 - e0] = csr.cumprob[e0:e1]
        w_s[s, : e1 - e0] = csr.weights[e0:e1]

    sh = NamedSharding(mesh, P(axis, None))
    return ShardedDeviceGraph(
        jax.device_put(ip_s, sh), jax.device_put(ind_s, sh),
        jax.device_put(cp_s, sh), jax.device_put(w_s, sh),
        mesh=mesh, axis=axis, num_nodes=n,
    )


@partial(jax.jit, static_argnames=("num_walks", "walk_length", "n_iters"))
def sharded_random_walks(
    graph: ShardedDeviceGraph,
    starts: jax.Array,        # [B] int32, replicated
    key: jax.Array,
    num_walks: int,
    walk_length: int,
    n_iters: int,
) -> jax.Array:
    """Drop-in for ``random_walk.random_walks`` on a sharded graph: returns
    the same [B, num_walks * walk_length] visited buffer, bit-identical
    (same keys -> same uniforms -> same binary-search outcomes)."""
    b = starts.shape[0]
    w = num_walks
    num_nodes = graph.num_nodes
    c = graph.rows_per_shard
    axis = graph.axis

    def local(ip, ind, cp, starts_rep, key_rep):
        ip, ind, cp = ip[0], ind[0], cp[0]
        shard = jax.lax.axis_index(axis)
        row0 = shard * c
        cur = jnp.repeat(starts_rep.astype(jnp.int32), w)      # [B*W]
        alive = jnp.ones((b * w,), dtype=bool)

        def step(carry, k):
            cur, alive = carry
            u = jax.random.uniform(k, (b * w,))
            local_v = cur - row0
            owned = (local_v >= 0) & (local_v < c) & (cur < num_nodes)
            v = jnp.clip(local_v, 0, c - 1)
            start = ip[v]
            deg = jnp.where(owned, ip[v + 1] - start, 0)
            # Same lower-bound search as random_walk._weighted_next_hop,
            # over the shard-local cumprob slice (identical row values).
            lo = jnp.zeros_like(start)
            hi = deg
            for _ in range(n_iters):
                active = lo < hi
                mid = (lo + hi) >> 1
                cmid = jnp.take(cp, start + mid, mode="clip")
                go_right = active & (cmid < u)
                lo = jnp.where(go_right, mid + 1, lo)
                hi = jnp.where(active & ~go_right, mid, hi)
            nxt = jnp.take(
                ind, start + jnp.minimum(lo, jnp.maximum(deg - 1, 0)),
                mode="clip")
            has = owned & (deg > 0)
            # Exactly one shard owns each walker: masked psum merges the
            # per-shard answers (the sharded_gather pattern, riding ICI).
            nxt = jax.lax.psum(jnp.where(has, nxt, 0), axis)
            has = jax.lax.psum(has.astype(jnp.int32), axis) > 0
            record = alive & has
            visited_step = jnp.where(record, nxt, num_nodes)
            cur = jnp.where(record, nxt, cur)
            return (cur, record), visited_step

        keys = jax.random.split(key_rep, walk_length)
        (_, _), visited = jax.lax.scan(step, (cur, alive), keys)
        return visited.transpose(1, 0).reshape(b, w * walk_length)

    return shard_map(
        local, mesh=graph.mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P(), P()),
        out_specs=P(), check_vma=False,
    )(graph.indptr, graph.indices, graph.cumprob, starts, key)


@partial(jax.jit, static_argnames=("num_nodes", "num_iterations", "alpha"))
def sharded_ppr_scores(
    graph: ShardedDeviceGraph,
    sources: jax.Array,      # [B] int32, replicated
    num_nodes: int,
    alpha: float = 0.15,
    num_iterations: int = 10,
) -> jax.Array:
    """``ppr.ppr_scores`` on a sharded graph: each shard pushes residual
    mass along ITS edge slice (local row-normalization is exact — rows never
    split across shards) and one psum merges the [B, N] pushed frontier.
    Per-iteration traffic is the replicated frontier (B x N f32 — size the
    ``walk.ppr_batch`` accordingly), never the O(E) edge arrays. Summation
    order differs from the replicated form, so scores match to float
    tolerance rather than bit-exactly (ties in downstream top-k may resolve
    differently on exactly-equal scores)."""
    c = graph.rows_per_shard
    axis = graph.axis
    emax = graph.indices.shape[1]

    def local(ip, ind, w, sources_rep):
        ip, ind, w = ip[0], ind[0], w[0]
        shard = jax.lax.axis_index(axis)
        row0 = shard * c
        # Edge e belongs to the local row j with ip[j] <= e < ip[j+1];
        # padding edges (e >= ip[-1]) clip to the last row and carry weight
        # 0, so their messages vanish.
        src_local = jnp.clip(
            jnp.searchsorted(ip, jnp.arange(emax, dtype=jnp.int32),
                             side="right") - 1,
            0, c - 1).astype(jnp.int32)
        row_sum = jax.ops.segment_sum(w, src_local, num_segments=c)
        wnorm = w / jnp.maximum(jnp.take(row_sum, src_local), 1e-12)
        src_global = src_local + row0

        r = jax.nn.one_hot(sources_rep, num_nodes, dtype=jnp.float32)
        ppr = jnp.zeros_like(r)

        def body(_, state):
            ppr, r = state
            ppr = ppr + alpha * r
            msg = r[:, src_global] * wnorm[None, :]              # [B, Emax]
            pushed = jax.vmap(
                lambda m: jax.ops.segment_sum(m, ind,
                                              num_segments=num_nodes)
            )(msg)
            pushed = jax.lax.psum(pushed, axis)
            r = (1.0 - alpha) * pushed
            return ppr, r

        ppr, _ = jax.lax.fori_loop(0, num_iterations, body, (ppr, r))
        return ppr

    return shard_map(
        local, mesh=graph.mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None), P()),
        out_specs=P(), check_vma=False,
    )(graph.indptr, graph.indices, graph.weights, sources)
