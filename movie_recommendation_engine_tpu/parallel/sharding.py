"""Sharded (multi-chip) training step: dp over ``data``, row-sharded tables
over ``model``.

The reference has no distributed code at all (SURVEY.md §2b); this is the
TPU-native design: annotate NamedShardings on a jitted step and let XLA's
SPMD partitioner insert the collectives —

- batch indices (q / p / hard negatives) sharded over ``data`` -> gradient
  psum over ICI inserted automatically by the partitioner,
- node feature + neighborhood tables row-sharded over ``model`` -> table
  gathers become partitioned gathers/all-to-alls over ICI,
- parameters replicated.

This is the same program the single-chip Trainer runs, specialized with
shardings; numerics are identical.
"""

from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import losses, pinsage
from ..train import optim


class ShardedStepConfig(NamedTuple):
    aggregator: str = "importance"
    loss: str = "max_margin"            # max_margin | batch_hard | curriculum | cosine
    margin: float = 0.1
    num_hard: int = 0
    epoch: int = 0
    max_epochs: int = 10
    hard_neg_factor: float = 2.0
    valid_limit: int | None = None
    dtype: Any = jnp.bfloat16


def make_sharded_train_step(mesh: Mesh, scfg: ShardedStepConfig):
    """Returns (step_fn, shardings) where

    step_fn(params, opt_state, x_table, nbrs_l, w_l, pool_mats, q, p,
            rand_negs, hard_negs, lr) -> (params, opt_state, loss)

    nbrs_l / w_l are tuples of per-layer [N, K] tables. ``hard_negs`` must be
    a [B, num_hard] array when scfg.num_hard > 0, else a [B, 1] placeholder.

    ``pool_mats`` (tuple, possibly empty) carries the dense MXU pooling
    matrices of the hybrid/dense path (models/pinsage.dense_pool_matrix) —
    the fast path at ML-25M scale. Each [N, N] matrix is **row-sharded over
    the model axis**: a chip holds an [N/m, N] slab, all-gathers the (much
    smaller) [N, H] activation table over ICI, and produces its output row
    shard locally. At 59k rows the bf16 matrix is 7 GB — row-sharding is
    what fits it on small-HBM chips and is the natural layout (the
    partitioner inserts one all-gather of 30 MB of activations per layer
    instead of moving the 7 GB matrix)."""
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("model", None))
    dat = NamedSharding(mesh, P("data"))
    dat2 = NamedSharding(mesh, P("data", None))

    def step(params, opt_state, x_table, nbrs_l, w_l, pool_mats, q, p,
             rand_negs, hard_negs, lr):
        b = q.shape[0]
        r = rand_negs.shape[0]

        def loss_fn(params):
            nodes = [q, p, rand_negs]
            if scfg.num_hard > 0:
                nodes.append(hard_negs.reshape(-1))
            all_nodes = jnp.concatenate(nodes)
            # Dense fast path only for plain [N, N] arrays — a full set of
            # HubPool operators (hub_pool_final_layer) routes through
            # pooled_forward_batch's structured-pool dispatch.
            if (len(pool_mats) == len(params["convs"])
                    and all(isinstance(pm, jax.Array) for pm in pool_mats)):
                emb = pinsage.pooled_forward_batch_dense(
                    params, x_table, list(pool_mats), all_nodes,
                    dtype=scfg.dtype,
                )
            else:
                emb = pinsage.pooled_forward_batch(
                    params, x_table, list(nbrs_l), list(w_l), all_nodes,
                    valid_limit=scfg.valid_limit, dtype=scfg.dtype,
                    aggregator=scfg.aggregator,
                    pool_mats=pool_mats,
                    # Always XLA under a mesh: pl.pallas_call has no SPMD
                    # partitioning rule, so it cannot trace with row-sharded
                    # operands (the partitioner would replicate the table).
                    gather_impl="xla",
                )
            q_emb, p_emb = emb[:b], emb[b : 2 * b]
            r_emb = emb[2 * b : 2 * b + r]
            h_emb = (
                emb[2 * b + r :].reshape(b, scfg.num_hard, -1)
                if scfg.num_hard > 0 else None
            )
            if scfg.loss == "cosine":
                return losses.cosine_objective(q_emb, p_emb)
            if scfg.loss == "batch_hard":
                return losses.batch_hard_triplet_loss(q_emb, p_emb, scfg.margin)
            if scfg.loss == "max_margin":
                return losses.shared_pool_max_margin_loss(
                    q_emb, p_emb, r_emb, scfg.margin
                )
            return losses.curriculum_loss(
                q_emb, p_emb, r_emb, h_emb, scfg.epoch,
                margin=scfg.margin, max_epochs=scfg.max_epochs,
                hard_negative_factor=scfg.hard_neg_factor,
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        params, opt_state = optim.adam_update(grads, opt_state, params, lr)
        return params, opt_state, loss

    def tree_shard(tree, sharding):
        return jax.tree_util.tree_map(lambda _: sharding, tree)

    pool_shard = _pool_mat_sharding(mesh, rep, row)

    def shardings_for(params, opt_state, nbrs_l, w_l, pool_mats=()):
        in_shardings = (
            tree_shard(params, rep),
            tree_shard(opt_state, rep),
            row,                                   # x_table
            tuple(row for _ in nbrs_l),            # nbr tables
            tuple(row for _ in w_l),               # weight tables
            tuple(pool_shard(m) for m in pool_mats),  # pooling operators
            dat, dat,                              # q, p
            rep,                                   # rand_negs (shared pool)
            dat2,                                  # hard_negs
            rep,                                   # lr
        )
        out_shardings = (
            tree_shard(params, rep), tree_shard(opt_state, rep), rep
        )
        return in_shardings, out_shardings

    def compile_step(params, opt_state, nbrs_l, w_l, pool_mats=()):
        in_sh, out_sh = shardings_for(params, opt_state, nbrs_l, w_l, pool_mats)
        return jax.jit(step, in_shardings=in_sh, out_shardings=out_sh)

    return compile_step


def sharded_embed_fn(mesh: Mesh, scfg: ShardedStepConfig):
    """Full-corpus embedding generation sharded over the model axis: the
    output [N, E] table comes back row-sharded (it stays distributed for
    sharded retrieval)."""
    rep = NamedSharding(mesh, P())
    row = NamedSharding(mesh, P("model", None))

    def embed(params, x_table, nbrs_l, w_l, pool_mats=()):
        if (pool_mats and len(pool_mats) == len(params["convs"])
                and all(isinstance(pm, jax.Array) for pm in pool_mats)):
            return pinsage.pooled_forward_dense(
                params, x_table, list(pool_mats), dtype=scfg.dtype,
            )
        return pinsage.pooled_forward(
            params, x_table, list(nbrs_l), list(w_l),
            valid_limit=scfg.valid_limit, dtype=scfg.dtype,
            aggregator=scfg.aggregator, pool_mats=pool_mats,
            gather_impl="xla",  # no SPMD rule for pallas_call (see step)
        )

    pool_shard = _pool_mat_sharding(mesh, rep, row)

    def compile_embed(params, nbrs_l, w_l, pool_mats=()):
        in_sh = (
            jax.tree_util.tree_map(lambda _: rep, params),
            row, tuple(row for _ in nbrs_l), tuple(row for _ in w_l),
            tuple(pool_shard(m) for m in pool_mats),
        )
        return jax.jit(embed, in_shardings=in_sh, out_shardings=row)

    return compile_embed


def _pool_mat_sharding(mesh: Mesh, rep, row):
    """Per-operator in_shardings for a pooling operand: dense [N, N] arrays
    row-shard directly; HubPool/BlockPool pytrees shard their table-row-
    indexed leaves over the model axis and replicate the small index
    vectors (a blanket rank-2 spec would reject 1-D leaves like head_ids)."""
    from ..ops.block_sparse import BlockPool
    from ..ops.hub_pool import HubPool

    row4 = NamedSharding(mesh, P("model", None, None, None))

    def pool_shard(pm):
        if isinstance(pm, HubPool):
            return HubPool(a_head=row, head_ids=rep,
                           res_nbrs=row, res_w=row)
        if isinstance(pm, BlockPool):
            return BlockPool(a_blocks=row4, col_idx=row, perm=rep, inv=rep)
        return row

    return pool_shard
