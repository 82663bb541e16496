"""Neighborhood aggregator zoo over fixed-shape [B, K] neighborhoods.

Batched, maskable re-designs of the reference's five aggregators
(``model/aggregators.py:5-287``) and pooling layers (``model/layers.py``),
selected by the ``AGGREGATOR_TYPE`` knob that the reference declares but never
wires up (config.py:23; ctor kwarg commented out at run.py:109). Here the knob
works: the PinSage conv calls ``aggregate(kind, ...)``.

Shared conventions: neighbor slots with id >= valid_limit (or == sentinel) are
masked out; rows with no valid neighbors aggregate to zero (matching every
reference aggregator's empty-neighbor branch).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-12

KINDS = ("mean", "weighted", "attention", "max", "importance",
         "importance_transform")


def init_aggregator_params(key, kind: str, in_dim: int, out_dim: int):
    """Parameters for the parameterized aggregators; None for mean/weighted.

    - attention: 2-layer MLP over [self || neighbor] (model/aggregators.py:107-111)
    - max: per-neighbor MLP before the max (model/aggregators.py:177-180)
    - importance: linear transform + LayerNorm (model/aggregators.py:228-231)
      (the *plain* importance pooling used by the wired model has no params;
      this is the standalone ImportanceAggregator variant)
    """
    from .pinsage import _linear_init

    if kind == "attention":
        k1, k2 = jax.random.split(key)
        return {
            "attn1": _linear_init(k1, in_dim * 2, in_dim),
            "attn2": _linear_init(k2, in_dim, 1),
        }
    if kind == "max":
        return {"mlp": _linear_init(key, in_dim, out_dim)}
    if kind == "importance_transform":
        return {
            "transform": _linear_init(key, in_dim, out_dim),
            "ln_scale": jnp.ones((out_dim,)),
            "ln_bias": jnp.zeros((out_dim,)),
        }
    return None


def _mask_and_gather(h_table, nbrs, valid_limit, dtype=None):
    n = h_table.shape[0]
    limit = n if valid_limit is None else min(valid_limit, n)
    valid = nbrs < limit
    # Cast before gathering — the [B, K, D] gather dominates bandwidth.
    src = h_table if dtype is None else h_table.astype(dtype)
    feats = jnp.take(src, jnp.minimum(nbrs, n - 1), axis=0, mode="clip")
    return feats, valid


def mean_aggregate(h_table, nbrs, valid_limit=None, dtype=jnp.bfloat16):
    """Unweighted mean over valid neighbors (model/aggregators.py:5-39)."""
    feats, valid = _mask_and_gather(h_table, nbrs, valid_limit, dtype)
    cnt = jnp.sum(valid, axis=1, keepdims=True).astype(jnp.float32)
    w = jnp.where(valid, 1.0, 0.0) / jnp.maximum(cnt, 1.0)
    out = jnp.einsum("bk,bkd->bd", w.astype(dtype), feats,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


def weighted_aggregate(h_table, nbrs, weights, valid_limit=None, dtype=jnp.bfloat16):
    """Normalized weighted sum; mean fallback when all weights are zero
    (model/aggregators.py:41-91)."""
    feats, valid = _mask_and_gather(h_table, nbrs, valid_limit, dtype)
    w = jnp.where(valid, weights, 0.0)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    cnt = jnp.sum(valid, axis=1, keepdims=True).astype(jnp.float32)
    uniform = jnp.where(valid, 1.0, 0.0) / jnp.maximum(cnt, 1.0)
    w = jnp.where(wsum > 0, w / jnp.maximum(wsum, _EPS), uniform)
    out = jnp.einsum("bk,bkd->bd", w.astype(dtype), feats,
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


def attention_aggregate(params, h_table, nbrs, self_feats, valid_limit=None,
                        dtype=jnp.bfloat16):
    """Softmax attention over [self || neighbor] concat
    (model/aggregators.py:93-160)."""
    from .pinsage import linear

    feats, valid = _mask_and_gather(h_table, nbrs, valid_limit, dtype)
    feats = feats.astype(jnp.float32)
    b, k, d = feats.shape
    self_exp = jnp.broadcast_to(self_feats[:, None, :], (b, k, d))
    cat = jnp.concatenate([self_exp, feats], axis=-1).reshape(b * k, 2 * d)
    scores = linear(params["attn2"], jax.nn.relu(linear(params["attn1"], cat, dtype)), dtype)
    scores = scores.reshape(b, k)
    scores = jnp.where(valid, scores, -jnp.inf)
    attn = jax.nn.softmax(scores, axis=1)
    attn = jnp.where(jnp.any(valid, axis=1, keepdims=True), attn, 0.0)
    out = jnp.einsum("bk,bkd->bd", attn.astype(dtype), feats.astype(dtype),
                     preferred_element_type=jnp.float32)
    return out.astype(jnp.float32)


def max_aggregate(params, h_table, nbrs, valid_limit=None, dtype=jnp.bfloat16):
    """Per-neighbor MLP + ReLU then elementwise max
    (model/aggregators.py:162-211)."""
    from .pinsage import linear

    feats, valid = _mask_and_gather(h_table, nbrs, valid_limit, dtype)
    feats = feats.astype(jnp.float32)
    b, k, d = feats.shape
    t = jax.nn.relu(linear(params["mlp"], feats.reshape(b * k, d), dtype))
    t = t.reshape(b, k, -1)
    t = jnp.where(valid[:, :, None], t, -jnp.inf)
    out = jnp.max(t, axis=1)
    return jnp.where(jnp.isfinite(out), out, 0.0)


def importance_transform_aggregate(params, h_table, nbrs, weights,
                                   valid_limit=None, dtype=jnp.bfloat16):
    """Linear transform -> normalized weighted sum -> LayerNorm
    (model/aggregators.py:213-287)."""
    from .pinsage import linear

    feats, valid = _mask_and_gather(h_table, nbrs, valid_limit, dtype)
    feats = feats.astype(jnp.float32)
    b, k, d = feats.shape
    t = linear(params["transform"], feats.reshape(b * k, d), dtype).reshape(b, k, -1)
    w = jnp.where(valid, weights, 0.0)
    wsum = jnp.sum(w, axis=1, keepdims=True)
    cnt = jnp.sum(valid, axis=1, keepdims=True).astype(jnp.float32)
    uniform = jnp.where(valid, 1.0, 0.0) / jnp.maximum(cnt, 1.0)
    w = jnp.where(wsum > 0, w / jnp.maximum(wsum, _EPS), uniform)
    agg = jnp.einsum("bk,bkd->bd", w.astype(dtype), t.astype(dtype),
                     preferred_element_type=jnp.float32).astype(jnp.float32)
    mean = agg.mean(axis=-1, keepdims=True)
    var = agg.var(axis=-1, keepdims=True)
    normed = (agg - mean) * jax.lax.rsqrt(var + 1e-5)
    out = normed * params["ln_scale"] + params["ln_bias"]
    # Empty-neighborhood rows stay zero (reference returns zeros pre-norm).
    any_valid = jnp.any(valid, axis=1, keepdims=True)
    return jnp.where(any_valid, out, 0.0)


def aggregate(kind, params, h_table, nbrs, weights, self_feats=None,
              valid_limit=None, dtype=jnp.bfloat16, gather_impl=None):
    """Dispatch honoring AGGREGATOR_TYPE (config.py:23). "importance" is the
    plain importance pooling used by the wired PinSage model
    (model/pinsage.py:94-150). ``gather_impl`` ("xla"/"pallas"/None=module
    default) selects the importance-pool gather implementation; the other
    aggregators are XLA-only."""
    if kind == "importance":
        from .pinsage import importance_pool

        return importance_pool(h_table, nbrs, weights, valid_limit, dtype,
                               impl=gather_impl)
    if kind == "mean":
        return mean_aggregate(h_table, nbrs, valid_limit, dtype)
    if kind == "weighted":
        return weighted_aggregate(h_table, nbrs, weights, valid_limit, dtype)
    if kind == "attention":
        return attention_aggregate(params, h_table, nbrs, self_feats, valid_limit, dtype)
    if kind == "max":
        return max_aggregate(params, h_table, nbrs, valid_limit, dtype)
    if kind == "importance_transform":
        return importance_transform_aggregate(params, h_table, nbrs, weights, valid_limit, dtype)
    raise ValueError(f"unknown aggregator: {kind}")
