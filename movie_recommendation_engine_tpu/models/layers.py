"""Standalone layer variants (functional).

Counterparts of the reference's alternate layer zoo (``model/layers.py`` —
standalone there too, not wired into the shipped PinSage; SURVEY.md §2
row 13): a GraphConv block with Xavier init + BatchNorm + ReLU + L2-norm,
plus the three pooling layers. The pooling layers share their math with
``models/aggregators.py`` (weighted-mean == weighted_aggregate,
max == max pooling over valid neighbors, importance == importance_pool) and
are exposed here under their reference names.

The main model honors the ``USE_BATCH_NORM`` knob (reference config.py:25,
declared but unused there) through ``init_params(..., use_batch_norm=True)``
in models/pinsage.py, which adds per-conv scale/bias applied with batch
statistics.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .aggregators import max_aggregate, weighted_aggregate  # noqa: F401 (re-export)
from .pinsage import importance_pool, l2_normalize, linear


def xavier_uniform(key, fan_in: int, fan_out: int) -> jax.Array:
    """nn.init.xavier_uniform_ (model/layers.py:36-38)."""
    bound = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, (fan_in, fan_out), minval=-bound, maxval=bound)


def init_graph_conv_layer(key, in_dim: int, out_dim: int) -> dict:
    """GraphConvLayer params: Xavier weights, zero biases, BatchNorm
    scale/bias (model/layers.py:17-42)."""
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "self": {"w": xavier_uniform(k1, in_dim, out_dim),
                 "b": jnp.zeros((out_dim,))},
        "neigh": {"w": xavier_uniform(k2, in_dim, out_dim),
                  "b": jnp.zeros((out_dim,))},
        "out": {"w": xavier_uniform(k3, 2 * out_dim, out_dim),
                "b": jnp.zeros((out_dim,))},
        "bn": {"scale": jnp.ones((out_dim,)), "bias": jnp.zeros((out_dim,))},
    }


def batch_norm(x: jax.Array, scale: jax.Array, bias: jax.Array,
               eps: float = 1e-5) -> jax.Array:
    """Batch-statistics normalization (the reference layer applies BatchNorm1d
    only when batch size > 1, model/layers.py:68-69)."""
    if x.shape[0] <= 1:
        return x
    mean = x.mean(axis=0, keepdims=True)
    var = x.var(axis=0, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * scale + bias


def graph_conv_layer(params: dict, x: jax.Array, neigh_x: jax.Array,
                     dtype=jnp.float32) -> jax.Array:
    """lin_self(x) ‖ lin_neigh(neigh_x) -> lin_out -> BN -> ReLU -> L2-norm
    (model/layers.py:44-77)."""
    h_self = linear(params["self"], x, dtype)
    h_neigh = linear(params["neigh"], neigh_x, dtype)
    out = linear(params["out"], jnp.concatenate([h_self, h_neigh], axis=1), dtype)
    out = batch_norm(out, params["bn"]["scale"], params["bn"]["bias"])
    return l2_normalize(jax.nn.relu(out))


def importance_pooling_layer(x, nbrs, weights, valid_limit=None,
                             dtype=jnp.float32):
    """ImportancePoolingLayer (model/layers.py:79-133) == masked
    importance_pool with renormalization."""
    return importance_pool(x, nbrs, weights, valid_limit, dtype)


def weighted_mean_pooling_layer(x, nbrs, weights=None, valid_limit=None,
                                dtype=jnp.float32):
    """WeightedMeanPoolingLayer (model/layers.py:135-195): weighted sum when
    weights are given (mean fallback on zero weights), plain mean otherwise."""
    if weights is None:
        from .aggregators import mean_aggregate

        return mean_aggregate(x, nbrs, valid_limit, dtype)
    return weighted_aggregate(x, nbrs, weights, valid_limit, dtype)


def max_pooling_layer(x, nbrs, valid_limit=None, dtype=jnp.float32):
    """MaxPoolingLayer (model/layers.py:197-237): elementwise max over valid
    neighbor features (no MLP — unlike MaxPoolingAggregator)."""
    n = x.shape[0]
    limit = n if valid_limit is None else min(valid_limit, n)
    valid = nbrs < limit
    # Cast before the [B, K, D] gather — the bandwidth-dominating op.
    feats = jnp.take(x.astype(dtype), jnp.minimum(nbrs, n - 1), axis=0,
                     mode="clip")
    feats = jnp.where(valid[:, :, None], feats, -jnp.inf)
    out = jnp.max(feats, axis=1)
    return jnp.where(jnp.isfinite(out), out, 0.0)
