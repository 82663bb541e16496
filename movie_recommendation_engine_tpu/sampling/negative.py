"""Negative sampling: shared random negatives + rank-window hard negatives
with the curriculum schedule.

TPU-native replacement for the reference ``data/negative_sampler.py``:

- Random negatives: ``num_negative_samples`` distinct movies drawn without
  replacement, shared across the batch (negative_sampler.py:25-42).
- Hard negatives: per query, run walks, rank all visited nodes by visit count
  (descending), take the rank window [min_rank, max_rank), keep only movie
  nodes, and sample ``num_hard`` without replacement; random movies fill any
  shortfall (negative_sampler.py:44-99). The reference's per-query Python loop
  of 100 walks (its #2 hot loop, SURVEY.md §3) becomes one batched walk kernel
  call + a Gumbel-top-k draw over the masked rank window.
- Curriculum: from epoch >= 1, ``num_hard = min(epoch, max_hard)``
  (negative_sampler.py:118-121).

Note on the default configuration: with walk_length=2 and 100 walks, at most
200 distinct nodes are visited, so the [2000, 5000) window is always empty and
the reference silently degrades to random sampling. The kernel reproduces the
general mechanism (and that degenerate behavior) faithfully.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .random_walk import DeviceGraph, _run_length_counts, random_walks


def sample_random_negatives(
    key: jax.Array, num_movies: int, num_samples: int
) -> jax.Array:
    """[num_samples] distinct movie indices (negative_sampler.py:36-40)."""
    return jax.random.choice(
        key, num_movies, shape=(num_samples,), replace=False
    ).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "num_hard", "min_rank", "max_rank", "num_movies",
        "num_walks", "walk_length", "n_iters",
    ),
)
def sample_hard_negatives(
    graph: DeviceGraph,
    query_nodes: jax.Array,   # [B] int32 (movie indices)
    key: jax.Array,
    num_hard: int,
    num_movies: int,
    num_walks: int = 100,     # reference hardcodes 100 walks here (:67)
    walk_length: int = 2,
    min_rank: int = 2000,
    max_rank: int = 5000,
    n_iters: int = 16,
) -> jax.Array:
    """[B, num_hard] hard-negative movie indices."""
    b = query_nodes.shape[0]
    k_walk, k_sel, k_rand = jax.random.split(key, 3)

    visited = random_walks(graph, query_nodes, k_walk, num_walks, walk_length, n_iters)
    m = visited.shape[1]
    v = jnp.sort(visited, axis=1)
    counts = _run_length_counts(v, graph.sentinel)

    # Rank all visited nodes by count (desc). Only ranks < m exist.
    hi = min(max_rank, m)
    if min_rank >= hi:
        # Window entirely out of range: pure random fallback (reference
        # behavior with default walk budgets).
        return jax.random.randint(
            k_rand, (b, num_hard), 0, num_movies, dtype=jnp.int32
        )

    top_counts, pos = jax.lax.top_k(counts, hi)
    ranked_nodes = jnp.take_along_axis(v, pos, axis=1)
    window_nodes = ranked_nodes[:, min_rank:hi]
    window_counts = top_counts[:, min_rank:hi]
    valid = (window_counts > 0) & (window_nodes < num_movies)

    # Without-replacement sample of num_hard valid candidates per row via
    # uniform-noise top-k; invalid slots score -inf.
    noise = jax.random.uniform(k_sel, window_nodes.shape)
    score = jnp.where(valid, noise, -jnp.inf)
    kk = min(num_hard, window_nodes.shape[1])
    top_scores, sel = jax.lax.top_k(score, kk)
    chosen = jnp.take_along_axis(window_nodes, sel, axis=1)
    chosen_ok = jnp.isfinite(top_scores)
    if kk < num_hard:
        chosen = jnp.pad(chosen, ((0, 0), (0, num_hard - kk)))
        chosen_ok = jnp.pad(chosen_ok, ((0, 0), (0, num_hard - kk)))
    # Shortfall -> random movies (negative_sampler.py:88-95).
    fallback = jax.random.randint(
        k_rand, (b, num_hard), 0, num_movies, dtype=jnp.int32
    )
    return jnp.where(chosen_ok, chosen, fallback).astype(jnp.int32)


def curriculum_num_hard(epoch: int, max_hard: int = 6) -> int:
    """negative_sampler.py:118-121: 0 before epoch 1, then min(epoch, max)."""
    return 0 if epoch < 1 else min(epoch, max_hard)
